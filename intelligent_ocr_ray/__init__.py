"""intelligent_ocr_ray — a Ray-Data-native main-content extraction engine.

Re-expresses the per-page OCR semantics of the reference
(`anon-research-tools/intelligent-ocr`, read-only at /root/reference) as
per-turn extraction over Parquet tables of multi-turn conversation
transcripts (`conv_id, turn_idx, role, text, tool, ts`):

* unified extractor: HTML boilerplate strip (link-density + text-density),
  PDF-ish byte-stream layout parse (vertical/horizontal span segmentation,
  reading-order reconstruction), plain-text passthrough
  (reference: core/pdf_processor.py + core/ocr_engine.py semantics);
* NFKC normalization + CJK variant-map dual emission
  (reference: core/pdf_processor.py:631-665, core/variants.py:1234-1284);
* bounded per-row retry + fallback-to-original, never drop a row
  (reference: core/pdf_processor.py:1170-1212);
* stable (conv_id, turn_idx) output ordering, per-partition resumable
  output with manifest + fingerprints (reference: core/checkpoint.py);
* plus large-scale training-data ops: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), ANN similarity search,
  text analysis (lang-id, quality, token counts, fingerprints), and
  stubbed multimodal decode stages.

Everything is built on the public Ray Data + PyArrow APIs only. No code
is copied from the reference; all `file:line` mentions are *behavioral*
citations so parity can be audited.

IMPORTANT: nothing in this package calls ``ray.init()`` /
``ray.shutdown()`` — the driver, ``bench.py`` and the pytest fixture own
the Ray session.
"""

__version__ = "0.1.0"
