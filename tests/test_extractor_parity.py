"""Vectorized extractor stage ≡ serial per-row oracle, byte for byte —
the engine's version of the reference's pipelined-vs-standard output
equality test (tests/test_core.py:312-345, skipped there for needing
models; ours runs because the extractor is deterministic)."""

import numpy as np
import pyarrow as pa

from intelligent_ocr_ray.config import DEFAULT_CONFIG, ExtractorConfig
from intelligent_ocr_ray.functions.extract import extract_turn
from intelligent_ocr_ray.functions.variants import VariantMapper
from intelligent_ocr_ray.sources.transcripts import generate_transcripts
from intelligent_ocr_ray.stages.extractor import ExtractTurns


def serial_oracle(batch: pa.Table, config: ExtractorConfig) -> list[dict]:
    """Row-at-a-time reference: the pure functions applied per row with
    the same variant dual-emission rule the stage implements."""
    vm = VariantMapper(config.variants_path) if config.enable_variants else None
    rows = []
    for text in batch.column("text").to_pylist():
        ext, _ = extract_turn(text, config, None)
        normalized = None
        if (
            vm is not None
            and ext.status == "ok"
            and ext.extracted_text
            and vm.needs_normalization(ext.extracted_text)
        ):
            cand = vm.normalize(ext.extracted_text)
            if cand != ext.extracted_text:
                normalized = cand
        rows.append(
            {
                "route": ext.route,
                "extracted_text": ext.extracted_text,
                "text_normalized": normalized,
                "spans": [s.to_dict() for s in ext.spans],
                "status": ext.status,
                "error": ext.error,
            }
        )
    return rows


EDGE_TEXTS = [
    None,
    "",
    "   \t\r\n ",
    "----====----",
    "short words",
    "x" * 80,  # plain_long
    "　",  # ideographic space: plain route, empty after strip
    "café ﬁre ㌀",  # non-ASCII NFKC
    "大藏經 與 寶藏",  # variant-map hits
    "%LAYOUT\n10,10,50,20,0.9|hello\n10,30,50,40,0.8|world",
    "%LAYOUT\nBROKEN LINE",  # poisoned
    "%LAYOUT\n10,10,14,60,0.9|竖排\n30,10,90,22,0.8|横排",  # vertical col
    "<html><body><p>a paragraph with enough visible characters here</p>"
    '<nav><a href="x">nav link</a></nav></body></html>',
    "<p>&amp; escaped &lt;entities&gt; in a long enough block of text</p>",
    "a\x0bb",  # ASCII-trim vs unicode-trim disagreement
]


def test_stage_equals_serial_oracle_on_edges():
    batch = pa.table(
        {
            "conv_id": pa.array(["c"] * len(EDGE_TEXTS), pa.string()),
            "turn_idx": pa.array(range(len(EDGE_TEXTS)), pa.int32()),
            "role": pa.array(["user"] * len(EDGE_TEXTS), pa.string()),
            "text": pa.array(EDGE_TEXTS, pa.string()),
        }
    )
    got = ExtractTurns(DEFAULT_CONFIG)(batch).to_pylist()
    want = serial_oracle(batch, DEFAULT_CONFIG)
    for i, (g, w) in enumerate(zip(got, want)):
        for key, val in w.items():
            assert g[key] == val, (i, key, EDGE_TEXTS[i], g[key], val)


def test_stage_equals_serial_oracle_on_corpus():
    table = generate_transcripts(120, seed=99)
    got = ExtractTurns(DEFAULT_CONFIG)(table).to_pylist()
    want = serial_oracle(table, DEFAULT_CONFIG)
    assert len(got) == len(want) == table.num_rows
    mismatches = [
        (i, k)
        for i, (g, w) in enumerate(zip(got, want))
        for k in w
        if g[k] != w[k]
    ]
    assert mismatches == []


def test_stage_parity_without_variants():
    cfg = ExtractorConfig(enable_variants=False)
    table = generate_transcripts(40, seed=7)
    got = ExtractTurns(cfg)(table).to_pylist()
    want = serial_oracle(table, cfg)
    for g, w in zip(got, want):
        assert g["extracted_text"] == w["extracted_text"]
        assert g["text_normalized"] is None


def test_output_order_preserved():
    table = generate_transcripts(30, seed=3)
    out = ExtractTurns(DEFAULT_CONFIG)(table)
    assert out.column("conv_id").to_pylist() == table.column("conv_id").to_pylist()
    assert out.column("turn_idx").to_pylist() == table.column("turn_idx").to_pylist()
