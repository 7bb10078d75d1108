"""Extractor configuration — the engine analog of the reference's
constructor knobs (core/pdf_processor.py:378-429: dpi, min_confidence,
blank_page_threshold, enable_variants, page_retry_limit,
allow_fallback_copy, ...).

The config is a frozen dataclass so a stable *config fingerprint* can be
derived from it; a fingerprint change invalidates a resume manifest,
mirroring the reference's checkpoint invalidation on dpi/total_pages
mismatch (core/pdf_processor.py:1089-1093).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractorConfig:
    # Span-level confidence filter (reference min_confidence default 0.5,
    # core/pdf_processor.py:383,627-629).
    min_confidence: float = 0.5
    # Plain text longer than this (after strip) is passed through unchanged
    # — the "page already has a text layer" skip route
    # (reference threshold 50 chars, core/pdf_processor.py:527,1258).
    existing_text_threshold: int = 50
    # HTML block thresholds: a block survives boilerplate stripping iff its
    # stripped text is at least `html_min_block_chars` long AND its
    # link-density is at most `html_max_link_density` (link-density +
    # text-density heuristic; behavioral analog of the reference's
    # confidence filter applied to block scores).
    html_min_block_chars: int = 20
    html_max_link_density: float = 0.5
    # A pdfish span is "vertical" iff height > vertical_aspect * width
    # (reference: core/pdf_processor.py:649-659 uses factor 2).
    vertical_aspect: float = 2.0
    # Bounded per-row retry before fallback-to-original
    # (reference page_retry_limit default 2, core/pdf_processor.py:389).
    retry_limit: int = 2
    # Emit the original text as extracted_text when extraction fails
    # (reference allow_fallback_copy, core/pdf_processor.py:390,1170-1193).
    allow_fallback_copy: bool = True
    # Variant normalization on/off (reference enable_variants,
    # core/pdf_processor.py:422-425).
    enable_variants: bool = True
    # Optional path to a variants table file (first-char-canonical format);
    # None → built-in table (reference: file path beats embedded blob,
    # core/variants.py:1168-1185).
    variants_path: str | None = None
    # Cap on payload size fed to the extractor; longer payloads are
    # truncated and the truncation recorded (analog of the adaptive-zoom
    # oversized-image guard, core/pdf_processor.py:796-836).
    max_payload_chars: int = 1_000_000
    # Lenient layout parsing: skip malformed layout lines instead of
    # failing the whole payload — the degraded-quality profile of the
    # R3 ladder (reference: retry with fast mode / DPI−100,
    # desktop/workers.py:290-307: lower quality, higher success rate).
    lenient_layout: bool = False
    # Span byte-thinning: store (text_off, text_len) code-point
    # references into extracted_text instead of a duplicate text copy
    # in every span struct (every span of every route is a contiguous
    # slice of extracted_text by construction — html/pdfish join span
    # texts with '\n'). Roughly halves the bytes the fused flagship
    # shuffles and writes; schema.resolve_span_text() rebuilds the
    # text-carrying form losslessly. Default False = byte-identical
    # output to previous releases (parity-pinned).
    span_text_refs: bool = False

    def fingerprint(self) -> str:
        """Stable hash of the semantic knobs PLUS the output schema
        version, for manifest invalidation: a code upgrade that widens
        the committed span struct must not resume into a directory of
        narrower structs (review r3)."""
        from .schema import OUTPUT_SCHEMA_VERSION

        blob = json.dumps(
            dict(dataclasses.asdict(self), _schema_version=OUTPUT_SCHEMA_VERSION),
            sort_keys=True,
        )
        return hashlib.sha256(blob.encode("utf-8")).hexdigest()[:16]


DEFAULT_CONFIG = ExtractorConfig()
