"""hourly_distinct_users (pipelines/events.py) vs the DuckDB
count(DISTINCT) twin — real sf0.001 events plus a synthetic fixture
with null users (excluded), null timestamps (their own group), and a
user spanning several hours (partition-local distinct must still be
globally exact)."""

import datetime
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from intelligent_ocr_ray.pipelines.events import hourly_distinct_users

SQL = """
    SELECT date_trunc('hour', ts) AS hour,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
"""


def _compare(sf_dir):
    got = (
        hourly_distinct_users(sf_dir, num_parts=8)
        .to_pandas()
        .sort_values("hour", na_position="first")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = (
        con.sql(SQL).df().sort_values("hour", na_position="first").reset_index(drop=True)
    )
    assert got["hour"].astype("datetime64[us]").tolist() == want["hour"].astype(
        "datetime64[us]"
    ).tolist()
    assert got["n_users"].tolist() == want["n_users"].tolist()
    return got


def test_hourly_distinct_users_matches_duckdb_on_testdata():
    got = _compare("/root/testdata/sf0.001")
    assert len(got) > 1 and (got["n_users"] > 0).all()


def test_hourly_rollup_survives_all_null_ts_block(tmp_path):
    # an ALL-null-ts parquet row group used to kill the groupby reduce
    # (Ray re-converts timestamp keys through numpy datetimes); the
    # int64-micros key keeps the NaT window grouping like the oracle
    from intelligent_ocr_ray.pipelines.events import hourly_rollup

    t0 = datetime.datetime(2025, 1, 1, 0, 30)
    d = str(tmp_path)
    common = {
        "event_type": pa.array(["a", "b"]),
        "value": pa.array([1.0, 2.0]),
    }
    blk_null = pa.table({"ts": pa.array([None, None], pa.timestamp("us")), **common})
    blk_live = pa.table({"ts": pa.array([t0, t0], pa.timestamp("us")), **common})
    pq.write_table(blk_null, os.path.join(d, "events.parquet"))
    pq.write_table(blk_live, os.path.join(d, "events2.parquet"))
    import ray.data as rd

    ds = rd.from_arrow(blk_null).union(rd.from_arrow(blk_live))
    got = hourly_rollup("", ds=ds).to_pandas().sort_values(
        ["hour", "event_type"], na_position="first"
    ).reset_index(drop=True)
    # also drive Ray's real parquet-read path over the ALL-null-ts file
    # alone (one block, every window key null) — must not crash and must
    # produce exactly the NaT windows
    pq_only = hourly_rollup(d).to_pandas()
    assert len(pq_only) == 2 and pq_only["hour"].isna().all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/*.parquet')"
    )
    want = con.sql(
        """SELECT date_trunc('hour', ts) AS hour, event_type,
                  CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_cents,
                  count(*) AS n_events
           FROM events GROUP BY 1, 2"""
    ).df().sort_values(["hour", "event_type"], na_position="first").reset_index(drop=True)
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["sum_value_cents"].tolist() == want["sum_value_cents"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()


def test_hourly_distinct_users_edge_fixture(tmp_path):
    t0 = datetime.datetime(2025, 1, 1, 0, 30)
    hr = datetime.timedelta(hours=1)
    rows = {
        "event_id": pa.array(range(10), pa.int64()),
        "ts": pa.array(
            [t0, t0, t0 + hr, t0 + hr, t0 + 2 * hr, t0, None, t0 + hr, t0,
             t0 + 3 * hr],
            pa.timestamp("us"),
        ),
        # user 7 spans three hours; user 1 duplicated within one hour;
        # null users never count but an ALL-null hour still emits 0
        "user_id": pa.array([7, 1, 7, 1, 7, 1, 5, None, None, None], pa.int64()),
        "event_type": pa.array(["a"] * 10),
        "value": pa.array([1.0] * 10),
        "props": pa.array(["{}"] * 10),
    }
    d = str(tmp_path)
    pq.write_table(pa.table(rows), os.path.join(d, "events.parquet"))
    got = _compare(d)
    # hour 0: users {7, 1} (+ a null ts row for user 5 groups separately)
    by_hour = dict(
        zip(got["hour"].astype("datetime64[us]").tolist(), got["n_users"].tolist())
    )
    assert by_hour[t0.replace(minute=0)] == 2
    assert by_hour[(t0 + 2 * hr).replace(minute=0)] == 1
    # the all-null-user hour is present with an exact zero
    assert by_hour[(t0 + 3 * hr).replace(minute=0)] == 0
