"""Round-5 ADVICE pins: null-key filter accounting in the events
window family, loud rejection of float partials in the grouped-sum
finish, and strided-id robustness of the user partitioner."""

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

T0 = datetime.datetime(2024, 5, 1, 10, 0, 0)


def _write_events(path, n_valid=40, n_null_user=3, n_null_ts=2):
    """n_valid well-formed events (4 users, 1-min spacing → one session
    each) plus rows with null user_id / null ts that the window family
    drops by documented contract."""
    ts, user, eid, etype, val = [], [], [], [], []
    for i in range(n_valid):
        ts.append(T0 + datetime.timedelta(minutes=i))
        user.append(i % 4 + 1)
        eid.append(i + 1)
        etype.append("view" if i % 2 == 0 else "click")
        val.append(1.0)
    for i in range(n_null_user):
        ts.append(T0 + datetime.timedelta(minutes=i))
        user.append(None)
        eid.append(1000 + i)
        etype.append("click")
        val.append(1.0)
    for i in range(n_null_ts):
        ts.append(None)
        user.append(9)
        eid.append(2000 + i)
        etype.append("view")
        val.append(1.0)
    t = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(["{}"] * len(eid), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(path, "events.parquet"))


def test_null_key_filter_drop_count_pinned(tmp_path, ray_session):
    """The asof/rolling/sessionize contract silently drops NULL
    user/ts rows (divergence from SQL window semantics, documented in
    COVERAGE.md). Pin the accounting: every VALID event and ONLY the
    valid events flow into sessionize — so a regression that widens or
    narrows the null filter shows up as a row-count change here."""
    from intelligent_ocr_ray.pipelines.events import sessionize

    d = str(tmp_path)
    n_valid, n_null_user, n_null_ts = 40, 3, 2
    _write_events(d, n_valid, n_null_user, n_null_ts)
    sessions = sessionize(d, num_parts=4).to_pandas()
    # 1-min spacing within each of 4 users → exactly one session per user
    assert len(sessions) == 4
    assert int(sessions["n_events"].sum()) == n_valid  # null rows excluded, nothing else
    assert set(sessions["user_id"]) == {1, 2, 3, 4}  # user 9 (null-ts-only) dropped


def test_asof_null_rows_dropped_exactly(tmp_path, ray_session):
    from intelligent_ocr_ray.pipelines.events import asof_view_before_click

    d = str(tmp_path)
    _write_events(d, n_valid=40, n_null_user=3, n_null_ts=2)
    out = asof_view_before_click(d, num_parts=4).to_pandas()
    # valid clicks = odd i among the 40 valid rows = 20; the 3 null-user
    # clicks must NOT appear
    assert len(out) == 20
    assert out["user_id"].notna().all()


def test_grouped_sum_rejects_float_partials(ray_session):
    import ray.data as rd

    from intelligent_ocr_ray.io_utils import null_safe_grouped_sum

    bad = rd.from_arrow(
        pa.table({"g": ["a", "b"], "cents": pa.array([1.5, 2.5], pa.float64())})
    )
    with pytest.raises(Exception, match="integer"):
        null_safe_grouped_sum(bad, ["g"], [("cents", "total")], num_parts=2).take_all()

    ok = rd.from_arrow(pa.table({"g": ["a", "a"], "cents": pa.array([1, 2], pa.int64())}))
    rows = null_safe_grouped_sum(ok, ["g"], [("cents", "total")], num_parts=2).take_all()
    assert rows == [{"g": "a", "total": 3}]


def test_user_part_ids_spread_on_strided_ids():
    """Raw `id % num_parts` maps ids {0, 64, 128, …} all to partition 0;
    the multiplicative mix must spread them (ADVICE r4)."""
    from intelligent_ocr_ray.pipelines.events import _user_part_ids

    ids = np.arange(0, 64 * 1000, 64, dtype=np.int64)
    parts = _user_part_ids(ids, 64)
    assert parts.min() >= 0 and parts.max() < 64
    assert len(np.unique(parts)) >= 32
    # deterministic across calls (process-independent co-location)
    assert np.array_equal(parts, _user_part_ids(ids.copy(), 64))


def test_fingerprint_batch_matches_scalar():
    """The vectorized Mersenne-61 Horner (fingerprint_batch) must equal
    the scalar reference rolling_fingerprint bit-for-bit — including
    blank/null rows (→ 0), mixed separators, unicode tokens, and rows
    long enough to exercise the pow-table doubling."""
    import random
    import string

    from intelligent_ocr_ray.stages.text_stats import (
        _FP_BASE,
        _FP_MOD,
        _pow61_table,
        fingerprint_batch,
        rolling_fingerprint,
    )

    pw = _pow61_table(70)
    assert all(int(pw[i]) == pow(_FP_BASE, i, _FP_MOD) for i in range(70))

    rng = random.Random(11)
    texts = []
    for _ in range(500):
        n = rng.randrange(0, 30)
        toks = [
            "".join(rng.choices(string.ascii_letters + "éß漢字01", k=rng.randrange(1, 9)))
            for _ in range(n)
        ]
        t = rng.choice([" ", "  ", "\t", "\n", " \r\n "]).join(toks)
        if rng.random() < 0.25:
            t = " " + t + "\t"
        texts.append(t)
    texts += ["", "   ", None, "\t\r\n", "one", " x ", "a b c " * 40]
    col = pa.array(texts, pa.string())
    got = fingerprint_batch(col)
    want = np.array(
        [rolling_fingerprint(t or "") for t in texts], dtype=np.int64
    )
    assert (got == want).all()


def test_sessionize_salted_equals_unsalted(tmp_path, ray_session):
    """Mega-user skew hatch (VERDICT r4 #9): time-chunked sessionize
    must be ROW-IDENTICAL to the unsalted operator — one user holds 20%
    of events and gaps straddle the 30-min threshold, so chunk-boundary
    session merges are exercised for real."""
    from intelligent_ocr_ray.pipelines.events import sessionize, sessionize_salted

    rng = np.random.RandomState(3)
    n = 20000
    user = rng.randint(1, 300, n).astype(np.int64)
    user[: n // 5] = 77
    base = np.int64(1_700_000_000_000_000)
    ts = base + np.cumsum(rng.randint(1, 90 * 60 * 1_000_000, n).astype(np.int64))
    rng.shuffle(ts)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(rng.rand(n) * 100, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    cols = ["user_id", "session_idx", "n_events", "sum_value_cents", "session_start"]
    a = (
        sessionize(d, num_parts=4)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    b = (
        sessionize_salted(d, num_parts=4, time_salt=8)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a[cols], b[cols])
    # the mega user's sessions exist and chunk merges happened (fewer
    # sessions than chunks×something trivially true — pin > 0 instead)
    assert (a["user_id"] == 77).sum() > 0
