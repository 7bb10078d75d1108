"""Canonical Arrow schemas for the engine.

Input schema fixed by BASELINE.json ``input_hint``; output schema from
FIXTURES.md §3 (spans as Arrow ``list<struct>`` so batches stay
zero-copy — never Python-object columns).
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Bumped whenever the committed OUTPUT schema changes shape (e.g. the
# M12 font_size span field): folded into the config fingerprint so a
# resume against partitions committed by an older schema INVALIDATES
# instead of mixing struct widths in one output directory.
OUTPUT_SCHEMA_VERSION = 2

SPAN_TYPE = pa.struct(
    [
        pa.field("span_idx", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("score", pa.float64()),
        pa.field("vertical", pa.bool_()),
        # M12 span font metric (core/pdf_processor.py:652-659): computed
        # from layout geometry for pdfish spans, 0.0 for text-only routes
        pa.field("font_size", pa.float64()),
    ]
)

# Byte-thin span form (config.span_text_refs=True): the span TEXT is
# not stored — every span of every route is a contiguous slice of
# extracted_text (html/pdfish join their span texts with '\n';
# single-span routes alias the whole string), so (text_off, text_len)
# CODE-POINT offsets into extracted_text reproduce it exactly. Default
# output keeps the text-carrying form; the refs form roughly halves
# the bytes a fused flagship shuffles and writes (extracted strings
# were stored twice). `resolve_span_text` rebuilds the text-carrying
# form losslessly — parity pinned by tests/test_span_refs.py.
SPAN_REF_TYPE = pa.struct(
    [
        pa.field("span_idx", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text_off", pa.int32()),
        pa.field("text_len", pa.int32()),
        pa.field("score", pa.float64()),
        pa.field("vertical", pa.bool_()),
        pa.field("font_size", pa.float64()),
    ]
)


def resolve_span_text(table: pa.Table) -> pa.Table:
    """Convert a span-REFS output table back to the text-carrying span
    form. This is the consumer-side inverse (exports, tests) — the
    point of the refs form is that the HOT path (shuffle + write)
    never materializes the duplicate text; Arrow has no array-valued
    slice kernel, so the rebuild slices per span in Python
    (code-point offsets ≡ Python str slicing)."""
    import numpy as np
    import pyarrow.compute as pc

    spans = table.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    if spans.type == pa.list_(SPAN_TYPE):
        return table
    flat = spans.flatten()
    counts = np.asarray(pc.list_value_length(spans).fill_null(0), dtype=np.int64)
    ext = table.column("extracted_text")
    if isinstance(ext, pa.ChunkedArray):
        ext = ext.combine_chunks()
    # one Python-str materialization per ROW (not per span): a
    # span-heavy row would otherwise convert its full extracted_text
    # once per span — O(doc_len × spans) memory for no benefit
    row_texts = ext.to_pylist()
    row_of = np.repeat(np.arange(len(counts)), counts)
    off = np.asarray(flat.field("text_off"), dtype=np.int64)
    ln = np.asarray(flat.field("text_len"), dtype=np.int64)
    texts = pa.array(
        [
            row_texts[r][o : o + l]
            for r, o, l in zip(row_of, off, ln)
        ],
        pa.string(),
    )
    struct = pa.StructArray.from_arrays(
        [
            flat.field("span_idx"),
            flat.field("kind"),
            texts,
            flat.field("score"),
            flat.field("vertical"),
            flat.field("font_size"),
        ],
        fields=list(SPAN_TYPE),
    )
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    new_spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    i = table.schema.get_field_index("spans")
    return table.set_column(i, "spans", new_spans)


EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("tool", pa.string()),  # provenance passthrough (input payload pair)
        pa.field("route", pa.string()),  # which extractor handled the payload
        pa.field("extracted_text", pa.string()),
        pa.field("text_normalized", pa.string()),  # null unless variant map changed it
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("status", pa.string()),  # 'ok' | 'skipped' | 'fallback'
        pa.field("error", pa.string()),  # null unless status == 'fallback'
    ]
)

STATUS_OK = "ok"
STATUS_SKIPPED = "skipped"
STATUS_FALLBACK = "fallback"
