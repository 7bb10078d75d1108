"""Metrics / lineage aggregates vs serial oracles."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from intelligent_ocr_ray.pipelines.metrics import (
    completeness_by_conv,
    conv_stats,
    status_profile,
)

SF = "/root/testdata/sf0.001"


def _transcripts():
    from intelligent_ocr_ray.sources.transcripts import transcripts_from_documents

    return transcripts_from_documents(SF)


def test_conv_stats_vs_pandas():
    got = conv_stats(_transcripts()).to_pandas().sort_values("conv_id").reset_index(drop=True)
    raw = _transcripts().to_pandas()
    raw["turn_chars"] = raw.text.str.len()
    want = (
        raw.groupby("conv_id")
        .agg(n_turns=("turn_idx", "size"), max_turn_idx=("turn_idx", "max"),
             sum_chars=("turn_chars", "sum"))
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"sum_chars": "int64"}), want.astype({"sum_chars": "int64"}),
        check_dtype=False,
    )


def test_status_profile_sums_to_input():
    from intelligent_ocr_ray.config import DEFAULT_CONFIG
    from intelligent_ocr_ray.pipelines.extract import extract_dataset

    ds = extract_dataset(_transcripts(), DEFAULT_CONFIG)
    prof = status_profile(ds).to_pandas()
    assert prof.n.sum() == 500  # every input row lands in exactly one bucket
    assert set(prof.status) <= {"ok", "skipped", "fallback"}


def test_run_metrics_written_and_rolled_up(tmp_path):
    from intelligent_ocr_ray.pipelines.metrics import rollup_metrics, write_run_metrics
    from intelligent_ocr_ray.pipelines.resumable import run_resumable
    from intelligent_ocr_ray.sources.transcripts import write_transcripts

    src = write_transcripts(str(tmp_path / "in"), 40, seed=11)
    run_resumable(src, str(tmp_path / "out"), num_parts=4)
    metrics = rd.read_parquet(str(tmp_path / "out/metrics")).to_pandas()
    assert metrics.n.sum() > 0
    assert set(metrics.columns) >= {"status", "route", "n", "run_id", "config_fp"}

    # A2 roll-up across runs: scan, filter ok, sum per run
    roll = rollup_metrics(str(tmp_path / "out/metrics")).to_pandas()
    assert len(roll) == 1
    assert roll.rows_ok.iloc[0] == metrics[metrics.status == "ok"].n.sum()


def test_completeness_by_conv_detects_loss():
    t_in = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b", "b", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 0, 1, 2], pa.int32()),
        }
    )
    # output lost one turn of conversation b
    t_out = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
        }
    )
    bad = completeness_by_conv(
        rd.from_arrow(t_in), rd.from_arrow(t_out)
    ).to_pandas()
    assert list(bad.conv_id) == ["b"]
    assert list(bad.n_in) == [3] and list(bad.n_out) == [2]

    ok = completeness_by_conv(rd.from_arrow(t_in), rd.from_arrow(t_in)).to_pandas()
    assert len(ok) == 0


def test_status_profile_oracle_covers_parse_routes(tmp_path):
    """The driver's documents tables contain only plain rows, so the
    pdfish/html/error branches of the status_profile oracle SQL never
    fire there — exercise them here on a mixed corpus (pdfish ok,
    poisoned pdfish → fallback, html, blank, CJK plain)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from intelligent_ocr_ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(80, seed=23)
    docs = pa.table(
        {
            "doc_id": pa.array(range(t.num_rows), pa.int64()),
            "text": t.column("text"),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))

    import __ray_entry__ as entrymod

    got = (
        entrymod.queries()["status_profile"](str(tmp_path))
        .to_pandas()
        .sort_values(["status", "route"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (
        con.sql(entrymod.oracle_sql()["status_profile"])
        .df()
        .sort_values(["status", "route"])
        .reset_index(drop=True)
    )
    got["n"] = got["n"].astype("int64")
    want["n"] = want["n"].astype("int64")
    assert got.to_dict("records") == want.to_dict("records")
    # all the interesting branches actually appeared
    routes = set(got["route"])
    assert {"pdfish", "html", "blank", "error", "plain"} <= routes
    assert "fallback" in set(got["status"])


def test_events_asof_and_rolling_semantics(tmp_path):
    """As-of join tie-break (equal ts → max event_id) + no-prior-view
    null, and the 3-row sliding window resetting per user — vs DuckDB
    on a handcrafted log."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    us = 1_000_000
    rows = [
        # user 1: two views at the SAME ts before the click (tie), one after
        (0, 10 * us, 1, "view", 1.0),
        (1, 10 * us, 1, "view", 1.0),
        (2, 20 * us, 1, "click", 1.0),
        (3, 30 * us, 1, "view", 1.0),
        # user 2: click with NO prior view
        (4, 5 * us, 2, "click", 1.0),
        (5, 50 * us, 2, "view", 1.0),
        # click exactly AT a view's ts (<= is inclusive)
        (6, 50 * us, 2, "click", 1.0),
        # user 3: four days of purchases for the rolling window
        (7, 0 * us, 3, "purchase", 1.00),
        (8, 86400 * us, 3, "purchase", 2.00),
        (9, 2 * 86400 * us, 3, "purchase", 4.00),
        (10, 3 * 86400 * us, 3, "purchase", 8.00),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))

    asof = {
        r["click_id"]: (r["view_id"], r["gap_us"])
        for r in entrymod.queries()["events_asof"](str(tmp_path)).take_all()
    }
    assert asof[2] == (1, 10 * us)  # tie at ts=10 → event_id 1 wins
    assert asof[4] == (None, None)  # no prior view
    assert asof[6] == (5, 0)        # ts equality is inclusive

    roll = {
        (r["user_id"], r["day_cents"]): r["rolling3_cents"]
        for r in entrymod.queries()["events_rolling"](str(tmp_path)).take_all()
        if r["user_id"] == 3
    }
    assert roll[(3, 100)] == 100
    assert roll[(3, 200)] == 300
    assert roll[(3, 400)] == 700
    assert roll[(3, 800)] == 1400  # window slid: 2+4+8

    # and the full outputs match the oracle SQL on this table
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    for name in ("events_asof", "events_rolling"):
        got = entrymod.queries()[name](str(tmp_path)).to_pandas()
        want = con.sql(entrymod.oracle_sql()[name]).df()
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        assert g.astype(str).equals(w.astype(str)), name


def test_events_asof_fuzz_vs_bruteforce(tmp_path):
    """Randomized log with heavy ts collisions: the vectorized
    merge-scan as-of join equals the O(n²) per-click reference."""
    import os
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    rng = random.Random(77)
    n = 600
    us = 1_000_000
    rows = []
    for eid in range(n):
        rows.append(
            (
                eid,
                rng.randrange(0, 40) * us,  # small ts range → many ties
                rng.randrange(0, 8),
                rng.choice(["view", "click", "purchase"]),
            )
        )
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    got = {
        r["click_id"]: (r["view_id"], r["gap_us"])
        for r in entrymod.queries()["events_asof"](str(tmp_path)).take_all()
    }
    views = [r for r in rows if r[3] == "view"]
    clicks = [r for r in rows if r[3] == "click"]
    assert len(got) == len(clicks) > 0
    for ce, cts, cu, _ in clicks:
        cand = [(vts, ve) for ve, vts, vu, _ in views if vu == cu and vts <= cts]
        want = max(cand)[::-1] if cand else None  # latest ts, then max event_id
        if want is None:
            assert got[ce] == (None, None), ce
        else:
            ve, vts = want
            assert got[ce] == (ve, cts - vts), (ce, got[ce], want)


def test_events_rolling_fuzz_with_nulls_vs_oracle(tmp_path):
    """Randomized log including NULL values: the Ray rolling window
    matches the DuckDB oracle (both exclude null-value events)."""
    import os
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    rng = random.Random(99)
    n = 500
    day_us = 86_400_000_000
    rows = []
    for eid in range(n):
        val = None if rng.random() < 0.15 else round(rng.uniform(0.01, 500.0), 2)
        rows.append((eid, rng.randrange(0, 20) * day_us + rng.randrange(0, day_us), rng.randrange(0, 6), val))
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["purchase"] * n, pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    got = entrymod.queries()["events_rolling"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.sql(entrymod.oracle_sql()["events_rolling"]).df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    w = want[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(g) > 0 and g.equals(w)


def test_group_quantiles_matches_quantile_disc():
    """Histogram-CDF quantiles == DuckDB quantile_disc on boundary-heavy
    input: tiny groups, duplicate values, nulls, many tiny blocks."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intelligent_ocr_ray.stages.sketches import group_quantiles

    rng = np.random.RandomState(5)
    n = 4000
    groups = rng.choice(["a", "b", "c"], size=n)
    vals = np.round(rng.gamma(2.0, 10.0, size=n), 2)
    vals[rng.rand(n) < 0.05] = np.nan  # nulls excluded on both sides
    t = pa.table({"g": pa.array(list(groups)), "v": pa.array(vals, pa.float64())})
    # single-row group exercises the idx=0 floor
    t = pa.concat_tables([t, pa.table({"g": pa.array(["solo"]), "v": pa.array([3.21])})])
    ds = rd.from_arrow(t).map_batches(lambda b: b, batch_format="pyarrow")

    got = (
        group_quantiles(ds, "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
        WITH c AS (SELECT g, CAST(round_even(v * 100, 0) AS BIGINT) AS cents
                   FROM t WHERE v IS NOT NULL AND NOT isnan(v))
        SELECT g, quantile_disc(cents, 0.5) AS p50_cents,
               quantile_disc(cents, 0.9) AS p90_cents,
               quantile_disc(cents, 0.99) AS p99_cents,
               count(*) AS n_values
        FROM c GROUP BY g ORDER BY g
        """
    ).df()
    assert got[want.columns.tolist()].equals(want.astype(got.dtypes.to_dict()))


def test_all_null_groups_keep_comparable_dtypes(tmp_path):
    """A group whose every value is null must come back as a typed null
    (pandas float64 NaN — the oracle side's dtype), not an object-dtype
    Python None: Ray's aggregate emits a null-typed column when the
    whole column is null, which the explicit int64 result cast pins
    (review r3)."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from intelligent_ocr_ray.pipelines.events import hourly_rollup, props_rollup

    t0 = datetime.datetime(2025, 1, 1)
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([t0, t0], pa.timestamp("us")),
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["view", "view"]),
            "value": pa.array([None, None], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    h = hourly_rollup(str(tmp_path)).to_pandas()
    p = props_rollup(str(tmp_path)).to_pandas()
    assert h["sum_value_cents"].dtype.kind == "f" and h["sum_value_cents"].isna().all()
    assert p["sum_k"].dtype.kind == "f" and p["sum_k"].isna().all()
    assert list(h["n_events"]) == [2] and list(p["n_events"]) == [2]
