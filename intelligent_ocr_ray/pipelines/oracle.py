"""Serial single-process oracle (FIXTURES.md §3).

A pure-Python, row-by-row implementation of the same extractor leaf
functions, applied in stable ``(conv_id, turn_idx)`` order — the
equivalence target for the distributed pipeline (the comparison the
reference *wanted* to run in tests/test_core.py:312-345 but skipped for
needing models; ours is deterministic so it runs).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, ExtractorConfig
from ..functions.extract import extract_turn
from ..functions.variants import VariantMapper
from ..schema import SPAN_TYPE


def serial_extract(table: pa.Table, config: ExtractorConfig = DEFAULT_CONFIG) -> pa.Table:
    """Row-by-row extraction over an in-memory transcripts table,
    output sorted by (conv_id, turn_idx)."""
    vm = VariantMapper(config.variants_path) if config.enable_variants else None
    rows = table.select(["conv_id", "turn_idx", "role", "text"]).to_pylist()
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))

    out = {
        "conv_id": [],
        "turn_idx": [],
        "role": [],
        "route": [],
        "extracted_text": [],
        "text_normalized": [],
        "spans": [],
        "status": [],
        "error": [],
    }
    for r in rows:
        ext, normalized = extract_turn(r["text"], config, vm)
        out["conv_id"].append(r["conv_id"])
        out["turn_idx"].append(r["turn_idx"])
        out["role"].append(r["role"])
        out["route"].append(ext.route)
        out["extracted_text"].append(ext.extracted_text)
        out["text_normalized"].append(normalized)
        out["spans"].append([s.to_dict() for s in ext.spans])
        out["status"].append(ext.status)
        out["error"].append(ext.error)

    return pa.Table.from_arrays(
        [
            pa.array(out["conv_id"], pa.string()),
            pa.array(out["turn_idx"], pa.int32()),
            pa.array(out["role"], pa.string()),
            pa.array(out["route"], pa.string()),
            pa.array(out["extracted_text"], pa.string()),
            pa.array(out["text_normalized"], pa.string()),
            pa.array(out["spans"], pa.list_(SPAN_TYPE)),
            pa.array(out["status"], pa.string()),
            pa.array(out["error"], pa.string()),
        ],
        names=list(out.keys()),
    )
