"""Deterministic sampling / splitting operators."""

import pyarrow as pa

from intelligent_ocr_ray.stages.sampling import dataset_split, sample_batch, split_batch


def _ids(n):
    return pa.table({"doc_id": pa.array(range(n), pa.int64())})


def test_sample_rate_and_determinism():
    a = sample_batch(_ids(10_000), rate_pct=10)
    b = sample_batch(_ids(10_000), rate_pct=10)
    assert a.equals(b)  # pure function of ids
    assert 800 <= a.num_rows <= 1200  # ~10%
    # sample is a subset of the full split's 'bucket < 10' rows
    assert set(a.column("doc_id").to_pylist()) <= set(range(10_000))


def test_split_partitions_everything_consistently():
    out = split_batch(_ids(10_000))
    splits = out.column("split").to_pylist()
    counts = {s: splits.count(s) for s in ("train", "valid", "test")}
    assert sum(counts.values()) == 10_000
    assert 7500 <= counts["train"] <= 8500
    assert 700 <= counts["valid"] <= 1300
    assert 700 <= counts["test"] <= 1300
    # stable: same id → same split across calls and batch boundaries
    again = split_batch(_ids(10_000).slice(5000, 5000))
    assert again.column("split").to_pylist() == splits[5000:]


def test_dataset_split_e2e():
    df = dataset_split("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.split) <= {"train", "valid", "test"}


def test_kmv_distinct_accuracy_and_exact_branch():
    """KMV estimate within the theoretical error envelope vs exact
    distinct counts; groups under k are reported exactly."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from intelligent_ocr_ray.stages.sketches import kmv_distinct

    # 3 groups: tiny (exact branch), mid, large
    rows_g, rows_v = [], []
    for g, n in (("tiny", 10), ("mid", 500), ("big", 5000)):
        for v in range(n):
            rows_g.append(g)
            rows_v.append(f"{g}-{v}")
            if v % 3 == 0:  # duplicates must not inflate the count
                rows_g.append(g)
                rows_v.append(f"{g}-{v}")
    ds = rd.from_arrow(
        pa.table({"grp": pa.array(rows_g), "val": pa.array(rows_v)})
    )
    got = {r["grp"]: r["n_distinct_est"] for r in kmv_distinct(ds, "grp", "val", k=64).take_all()}
    assert got["tiny"] == 10  # exact branch
    for g, n in (("mid", 500), ("big", 5000)):
        rel = abs(got[g] - n) / n
        assert rel < 0.4, (g, got[g], rel)  # ~3σ at k=64 (σ ≈ 12.7%)


def test_rebalance_rates_and_determinism():
    """Per-group rates actually bite (~rate% per group), unlisted groups
    keep default 100%, and the assignment is layout-independent."""
    import numpy as np

    from intelligent_ocr_ray.stages.sampling import rebalance_batch

    n = 20_000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(["en", "de", "cjk", "fr"] * (n // 4)),
        }
    )
    out = rebalance_batch(t, {"en": 25, "cjk": 50})
    langs = np.asarray(out.column("lang"), dtype=object)
    per = {g: int((langs == g).sum()) / (n // 4) for g in ("en", "de", "cjk", "fr")}
    assert abs(per["en"] - 0.25) < 0.03 and abs(per["cjk"] - 0.5) < 0.03
    assert per["de"] == per["fr"] == 1.0
    # layout independence: chunked/sliced input keeps the identical set
    a = rebalance_batch(t.slice(0, n // 2), {"en": 25, "cjk": 50})
    b = rebalance_batch(t.slice(n // 2), {"en": 25, "cjk": 50})
    assert pa.concat_tables([a, b]).column("doc_id").to_pylist() == out.column("doc_id").to_pylist()
