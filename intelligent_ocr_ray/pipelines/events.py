"""Stream-shaped operators over the `events` table (event_id, ts,
user_id, event_type, value, props).

Ray Data has no event-time watermarks; the engine treats events as an
ordered partitioned log (ray_guide.md "Streaming-shaped workloads"):
tumbling windows = vectorized truncation + pre-aggregated groupby;
session windows = per-user map_groups over ts-sorted groups. The
reference's streaming semantics (bounded-queue pipeline,
core/pdf_processor.py:1156-1241) need no analog here beyond ordering —
Ray's streaming executor supplies backpressure.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum


def read_events(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def hourly_rollup(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per event_type: count + sum(value).

    Scale shape: the window key is computed vectorized per batch, and a
    per-batch PARTIAL aggregate shrinks the shuffle input from O(rows)
    to O(distinct hour×type per batch) before the global groupby —
    the mergeable-partial pattern (ray_guide.md "Aggregation at scale").
    """
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = batch.drop_columns(["ts"]).append_column("hour", hour)
        # arrow-native within-batch combine; count_all = count(*)
        # semantics (a null `value` still counts as an event, matching
        # the oracle SQL)
        return pa.TableGroupBy(t, ["hour", "event_type"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby(["hour", "event_type"]).aggregate(
        Sum("value_sum", alias_name="sum_value"),
        Sum("count_all", alias_name="n_events"),
    )
    return out


def props_rollup(sf_dir: str) -> rd.Dataset:
    """Schema-on-read over the JSON `props` column (the reference's
    JSONL log is read the same way, core/pdf_processor.py:160-189):
    extract `k` with one vectorized regex pass (pc.extract_regex — no
    per-row json.loads), then the usual partial→global aggregate."""
    ds = read_events(sf_dir, columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        hit = pc.extract_regex(batch.column("props"), r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(hit, "k"), pa.int64())
        t = pa.table({"event_type": batch.column("event_type"), "k": k})
        # count_all, not count(k): an event whose props lack `k` still
        # counts toward n_events (count(*) parity with the oracle)
        return pa.TableGroupBy(t, ["event_type"]).aggregate(
            [("k", "sum"), ([], "count_all")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("event_type").aggregate(
        Sum("k_sum", alias_name="sum_k"),
        Sum("count_all", alias_name="n_events"),
    )


SESSION_GAP_MINUTES = 30


def sessionize(sf_dir: str, num_parts: int = 64) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap from
    the previous event exceeds SESSION_GAP_MINUTES. Emits one row per
    session: user_id, session_idx, n_events, sum_value, session_start.

    Shape: users are hash-partitioned COARSELY (num_parts) and each
    partition sessionizes ALL its users in one vectorized pass (sort by
    user/ts/event_id; session boundaries = user change OR gap > thr;
    per-user session index via global cumsum re-based at user starts) —
    per-user map_groups dispatch costs more than the arithmetic at
    millions of users.

    Partitioning assumption (documented per SURVEY.md custom-operator
    rule): all events of one user land in one partition — valid while
    no single user approaches a partition in size; a hotter key would
    need the salted-subkey treatment from pipelines/ordering.py plus a
    session merge across salt boundaries.
    """
    ds = read_events(sf_dir, columns=["ts", "user_id", "event_id", "value"])

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t.column("user_id"), np.int64(num_parts - 1)), pa.int32()
        )
        return t.append_column("upart", part)

    def sessionize_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        gap = g["ts"].diff().dt.total_seconds().fillna(0.0)
        user_changed = g["user_id"].ne(g["user_id"].shift()).fillna(True)
        new_session = (user_changed | (gap > SESSION_GAP_MINUTES * 60)).to_numpy()
        grp = np.cumsum(new_session)  # global session ordinal
        # re-base per user: session_idx = ordinal − ordinal at user start
        user_start_grp = pd.Series(np.where(user_changed, grp, 0)).replace(0, np.nan)
        base = user_start_grp.ffill().to_numpy()
        g["session_idx"] = (grp - base).astype(np.int64)
        g["_grp"] = grp
        out = (
            g.groupby("_grp", sort=True)
            .agg(
                user_id=("user_id", "first"),
                session_idx=("session_idx", "first"),
                n_events=("event_id", "count"),
                sum_value=("value", "sum"),
                session_start=("ts", "min"),
            )
            .reset_index(drop=True)
        )
        return out[["user_id", "session_idx", "n_events", "sum_value", "session_start"]]

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("upart").map_groups(sessionize_partition, batch_format="pandas")
