"""Regression pins for the round-1 advisor findings: oversized-payload
truncation parity between the vectorized stage and the serial oracle,
variant emission on degraded-ladder rows, and the flagship pipeline not
leaking DataContext mutations into the process-global context."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from intelligent_ocr_ray.config import DEFAULT_CONFIG, ExtractorConfig
from intelligent_ocr_ray.functions.extract import degraded_ladder, extract_turn_ladder
from intelligent_ocr_ray.functions.variants import VariantMapper
from intelligent_ocr_ray.sources.transcripts import generate_transcripts
from intelligent_ocr_ray.stages.extractor import ExtractTurns

from test_extractor_parity import serial_oracle


def _batch(texts):
    return pa.table(
        {
            "conv_id": pa.array(["c"] * len(texts), pa.string()),
            "turn_idx": pa.array(range(len(texts)), pa.int32()),
            "role": pa.array(["user"] * len(texts), pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


# --- max_payload_chars truncation (advisor: medium) -----------------------


TRUNC_TEXTS = [
    "w " * 60,                    # plain_long, 120 chars → truncated mid-run
    "x" * 80,                     # plain_long, truncated to exactly 60 x's
    " " * 58 + "tail",            # plain (stripped=4 chars) but raw 62 → cut to spaces+ta
    " " * 61 + "gone",            # plain route; truncation leaves only spaces → skipped
    "short stays",                # under the cap, untouched
    "á" * 70,                     # non-ASCII: slice must count code points
    "%LAYOUT\n10,10,50,20,0.9|hello",  # parse route: truncation handled in extract_once
]


def test_truncation_parity_with_serial_oracle():
    cfg = ExtractorConfig(max_payload_chars=60)
    batch = _batch(TRUNC_TEXTS)
    got = ExtractTurns(cfg)(batch).to_pylist()
    want = serial_oracle(batch, cfg)
    for i, (g, w) in enumerate(zip(got, want)):
        for key, val in w.items():
            assert g[key] == val, (i, key, TRUNC_TEXTS[i][:40], g[key], val)
    # the cut really happened (not just a no-op parity)
    assert got[1]["extracted_text"] == "x" * 60
    assert got[3]["status"] == "skipped"


def test_truncation_parity_on_corpus():
    cfg = ExtractorConfig(max_payload_chars=120)
    table = generate_transcripts(60, seed=11)
    got = ExtractTurns(cfg)(table).to_pylist()
    want = serial_oracle(table, cfg)
    mism = [
        (i, k) for i, (g, w) in enumerate(zip(got, want)) for k in w if g[k] != w[k]
    ]
    assert mism == []


# --- degraded-row variant emission (advisor: low) -------------------------

# strict parse fails on the BROKEN line; lenient rung recovers the
# variant-carrying CJK line → status ok, error='degraded[0]: ...'
DEGRADED_VARIANT = "%LAYOUT\n10,10,20,80,0.9|大蔵經の研究\nBROKEN LINE"


def test_ladder_rows_skip_variant_emission():
    cfg = DEFAULT_CONFIG
    ladder = degraded_ladder(cfg)
    vm = VariantMapper(cfg.variants_path)
    texts = [
        DEGRADED_VARIANT,
        "旧字体の変換規則",        # healthy variant row: emission applies
        "%LAYOUT\nNO RECOVERY \x00",  # fully poisoned → fallback
        "plain row",
    ]
    got = ExtractTurns(cfg, use_ladder=True)(_batch(texts)).to_pylist()
    for g, text in zip(got, texts):
        ext, normalized = extract_turn_ladder(text, cfg, ladder, vm)
        assert g["status"] == ext.status, text
        assert g["error"] == ext.error, text
        assert g["extracted_text"] == ext.extracted_text, text
        assert g["text_normalized"] == normalized, text
    # the interesting row really took the degraded path AND has variant
    # chars in its text, yet text_normalized stays None on both sides
    assert got[0]["status"] == "ok"
    assert got[0]["error"].startswith("degraded[0]")
    assert got[0]["text_normalized"] is None
    # ...while the healthy variant row still dual-emits
    assert got[1]["text_normalized"] is not None


# --- flagship DataContext hygiene (advisor: low) --------------------------


def test_flagship_does_not_leak_datacontext(tmp_path):
    import ray.data as rd

    from intelligent_ocr_ray.pipelines.extract import flagship

    pq.write_table(generate_transcripts(20, seed=5), os.path.join(tmp_path, "t.parquet"))
    ctx = rd.DataContext.get_current()
    prev_polars = ctx.use_polars_sort
    prev_order = ctx.execution_options.preserve_order
    ds = flagship(str(tmp_path), ordered=True, concurrency=2)
    # the global context is untouched after pipeline construction...
    assert ctx.use_polars_sort == prev_polars
    assert ctx.execution_options.preserve_order == prev_order
    # ...but the pipeline's own captured context keeps the flags, and
    # the executed output is genuinely ordered
    assert ds.context.use_polars_sort is True
    assert ds.context.execution_options.preserve_order is True
    out = ds.select_columns(["conv_id", "turn_idx"]).take_all()
    keys = [(r["conv_id"], r["turn_idx"]) for r in out]
    assert keys == sorted(keys)


def test_key_lookup_inner_join_semantics():
    """Dimension keys absent from the table and fact keys outside the
    dense range are DROPPED (inner-join semantics), never uninitialized
    reads or IndexError (ADVICE r2: relational._key_lookup)."""
    import numpy as np
    import pyarrow as pa

    from intelligent_ocr_ray.pipelines.relational import _key_lookup, _lookup_take

    # dimension with a hole at key 3
    table, lo, valid = _key_lookup(pa.array([2, 4, 5]), pa.array(["b", "d", "e"]))
    fact = pa.array([2, 3, 4, 99, -7, 5])  # 3 absent; 99/-7 out of range
    keep, mapped = _lookup_take(fact, table, lo, valid)
    assert list(keep) == [0, 2, 5]
    assert list(mapped) == ["b", "d", "e"]


def test_kmv_rejects_unmirrorable_value_types():
    """str(v) != CAST(v AS VARCHAR) for bools/floats — kmv_distinct
    refuses them instead of silently breaking estimator parity."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from intelligent_ocr_ray.stages.sketches import kmv_distinct

    bad = rd.from_arrow(
        pa.table({"g": ["a", "a"], "v": pa.array([1.5, 2.5], pa.float64())})
    )
    with pytest.raises(Exception, match="integer or string"):
        kmv_distinct(bad, "g", "v").take_all()

    ok = rd.from_arrow(pa.table({"g": ["a", "a", "b"], "v": pa.array([1, 2, 1], pa.int64())}))
    rows = {r["g"]: r["n_distinct_est"] for r in kmv_distinct(ok, "g", "v").take_all()}
    assert rows == {"a": 2, "b": 1}
