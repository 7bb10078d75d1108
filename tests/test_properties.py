"""Property-based tests (hypothesis) for extractor invariants — the
engine's behavioral contract under arbitrary payloads:

* totality: the stage never raises and never drops/duplicates rows;
* fallback carries the original payload verbatim (R2);
* blank/skip rows are exactly the empty extractions;
* stage ≡ serial per-row oracle for every generated payload;
* variant normalization is idempotent and only dual-emits on change;
* MinHash signature similarity tracks Jaccard within statistical error.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from intelligent_ocr_ray.config import DEFAULT_CONFIG
from intelligent_ocr_ray.functions.extract import extract_turn
from intelligent_ocr_ray.functions.variants import VariantMapper
from intelligent_ocr_ray.stages.extractor import ExtractTurns

# payload soup: plain text, whitespace, CJK, HTML-ish, layout-ish, junk
_payload = st.one_of(
    st.none(),
    st.text(max_size=200),
    st.text(alphabet=" \t\r\n-=·•_~*", max_size=30),
    st.text(alphabet="大藏經寶言変換あいうカキク 漢字", max_size=80),
    st.builds(
        lambda body: f"<html><body><p>{body}</p></body></html>",
        st.text(alphabet="abcdefgh ijklmno", min_size=0, max_size=120),
    ),
    st.builds(
        lambda rows: "%LAYOUT\n"
        + "\n".join(f"{10*i},10,{10*i+50},20,0.9|{t}" for i, t in enumerate(rows)),
        st.lists(st.text(alphabet="xyz w", max_size=20), max_size=5),
    ),
    st.builds(lambda t: "%LAYOUT\n" + t, st.text(max_size=60)),  # likely poisoned
)


def _batch(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": pa.array(["c"] * n, pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


@settings(max_examples=40, deadline=None)
@given(st.lists(_payload, min_size=1, max_size=20))
def test_stage_total_and_row_preserving(texts):
    ex = ExtractTurns(DEFAULT_CONFIG)
    out = ex(_batch(texts))
    assert out.num_rows == len(texts)
    assert out.column("turn_idx").to_pylist() == list(range(len(texts)))
    for status in out.column("status").to_pylist():
        assert status in ("ok", "skipped", "fallback")


@settings(max_examples=40, deadline=None)
@given(st.lists(_payload, min_size=1, max_size=12))
def test_stage_matches_serial_oracle(texts):
    ex = ExtractTurns(DEFAULT_CONFIG)
    got = ex(_batch(texts)).to_pylist()
    vm = VariantMapper(DEFAULT_CONFIG.variants_path)
    for row, text in zip(got, texts):
        ext, _ = extract_turn(text, DEFAULT_CONFIG, None)
        assert row["extracted_text"] == ext.extracted_text
        assert row["status"] == ext.status
        assert row["route"] == ext.route
        if ext.status == "fallback":
            # R2: fallback carries the original payload verbatim
            assert row["extracted_text"] == (text or "")
        normalized = None
        if ext.status == "ok" and ext.extracted_text and vm.needs_normalization(ext.extracted_text):
            cand = vm.normalize(ext.extracted_text)
            if cand != ext.extracted_text:
                normalized = cand
        assert row["text_normalized"] == normalized


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_variant_normalize_idempotent(text):
    vm = VariantMapper(None)
    once = vm.normalize(text)
    assert vm.normalize(once) == once  # canonical form is a fixed point


@settings(max_examples=20, deadline=None)
@given(
    st.sets(st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=30, max_size=120),
    st.sets(st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=30, max_size=120),
)
def test_minhash_tracks_jaccard(a, b):
    from intelligent_ocr_ray.stages.dedup import MinHashLSH

    mh = MinHashLSH()
    true_j = len(a & b) / len(a | b)
    est = (mh.signature(a) == mh.signature(b)).mean()
    # 64 permutations → std ≈ sqrt(J(1-J)/64) ≤ 0.0625; allow 4σ
    assert abs(est - true_j) <= 0.25


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-10_000, max_value=10_000),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_group_quantiles_property_matches_quantile_disc(rows):
    """For ANY multiset of (group, cents) values — duplicates, negatives,
    singleton groups — the ceil(q*n)-1 index rule + searchsorted CDF
    walk (the math group_quantiles' finish stage runs; the distributed
    operator itself is pinned against DuckDB in test_metrics) lands on
    exactly DuckDB's quantile_disc element at every q."""
    import duckdb
    import math

    import numpy as np

    # serial reimplementation of the finish-stage walk (no Ray inside a
    # hypothesis example: session fixtures + shrinking don't mix)
    from intelligent_ocr_ray.stages.sketches import group_quantiles  # noqa: F401 — API under test

    qs = (0.5, 0.9, 0.99)
    groups = sorted({g for g, _ in rows})
    got = {}
    for g in groups:
        vals = np.sort(np.array([v for gg, v in rows if gg == g], dtype=np.int64))
        counts = np.ones(len(vals), np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        got[g] = tuple(
            int(vals[np.searchsorted(cum, max(0, math.ceil(q * n) - 1) + 1, "left")])
            for q in qs
        )
    want_rows = duckdb.sql(
        "SELECT g, quantile_disc(v, 0.5), quantile_disc(v, 0.9), quantile_disc(v, 0.99) "
        "FROM (SELECT unnest(?) g, unnest(?) v) GROUP BY g",
        params=[[g for g, _ in rows], [v for _, v in rows]],
    ).fetchall()
    want = {r[0]: (r[1], r[2], r[3]) for r in want_rows}
    assert got == want
