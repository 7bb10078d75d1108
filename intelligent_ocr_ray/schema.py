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
