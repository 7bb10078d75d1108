"""Stream-shaped operators over the `events` table (event_id, ts,
user_id, event_type, value, props).

Ray Data has no event-time watermarks; the engine treats events as an
ordered partitioned log (ray_guide.md "Streaming-shaped workloads"):
tumbling windows = vectorized truncation + pre-aggregated groupby;
session/as-of/rolling windows = one numpy pass per COARSE user
partition (Arrow end-to-end; no pandas, no per-user dispatch). The
reference's streaming semantics (bounded-queue pipeline,
core/pdf_processor.py:1156-1241) need no analog here beyond ordering —
Ray's streaming executor supplies backpressure.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def read_events(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Metadata-sized read (~64k rows/block, io_utils rationale): every
    consumer here feeds a groupby, which pays per block PAIR — sizing
    measured 3-4× of whole-query wall (0.24-0.34 s sized vs 1.0-1.1 s
    default across the four events queries at 32 CPUs)."""
    from ..io_utils import sized_read_parquet

    return sized_read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns, rows_per_block=65536
    )


def hourly_rollup(sf_dir: str, *, ds: "rd.Dataset | None" = None) -> rd.Dataset:
    """Tumbling 1-hour window per event_type: count + sum(value).

    Scale shape: the window key is computed vectorized per batch, and a
    per-batch PARTIAL aggregate shrinks the shuffle input from O(rows)
    to O(distinct hour×type per batch) before the global groupby —
    the mergeable-partial pattern (ray_guide.md "Aggregation at scale").
    ``ds`` overrides the read for tests that need a specific block
    layout (e.g. an all-null-ts block).
    """
    if ds is None:
        ds = read_events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # the window key travels as int64 micros through the shuffle:
        # Ray's reduce re-converts timestamp key columns through numpy
        # datetimes and dies on an all-null-ts block (ArrowConversionError)
        # — nullable int64 keys group cleanly; cast back at the end
        hour_us = pc.cast(
            pc.floor_temporal(
                pc.cast(batch.column("ts"), pa.timestamp("us")), unit="hour"
            ),
            pa.int64(),
        )
        # money fixed-point per value before summation (io_utils
        # .money_units discipline) — null stays null, so an all-null
        # window sums to NULL on both sides
        from ..io_utils import money_units

        cents = money_units(batch.column("value"))
        t = pa.table(
            {"hour_us": hour_us, "event_type": batch.column("event_type"), "cents": cents}
        )
        # count_all = count(*) semantics (a null `value` still counts
        # as an event, matching the oracle SQL)
        return pa.TableGroupBy(t, ["hour_us", "event_type"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )

    from ..io_utils import null_safe_grouped_sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = null_safe_grouped_sum(
        partials,
        ["hour_us", "event_type"],
        [("cents_sum", "sum_value_cents"), ("count_all", "n_events")],
        num_parts=32,
    )

    def to_ts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.cast(t.column("hour_us"), pa.timestamp("us")),
                "event_type": t.column("event_type"),
                "sum_value_cents": t.column("sum_value_cents"),
                "n_events": t.column("n_events"),
            }
        )

    return out.map_batches(to_ts, batch_format="pyarrow", zero_copy_batch=True)


def hourly_distinct_users(sf_dir: str, num_parts: int = 64) -> rd.Dataset:
    """EXACT distinct users per 1-hour tumbling window — the exact twin
    of the KMV estimate (sketches.kmv_distinct), at the cost of one
    narrow shuffle.

    Scale shape (two-level dedup, never a groupby with one group per
    (hour, user) pair): per-batch DISTINCT (hour, user) pairs shrink
    the shuffle input first; pairs are then hash-partitioned BY USER,
    so every occurrence of a user lands in one partition and the
    partition-local distinct is globally correct; each partition
    reduces to (hour, partial_count) rows and a tiny final groupby
    sums them. Null users are excluded (count(DISTINCT) semantics on
    the oracle side).
    """

    ds = read_events(sf_dir, columns=["ts", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        # the window key travels as int64 micros: Ray's shuffle machinery
        # mangles NULL timestamp keys (numpy datetime conversion), while
        # nullable int64 keys group cleanly; cast back at the end.
        # NULL users stay in as distinct (hour, null) rows — they keep
        # the hour PRESENT (the oracle emits (hour, 0) for an all-null
        # hour) but are never counted (pyarrow "count" skips nulls)
        hour_us = pc.cast(
            pc.floor_temporal(
                pc.cast(t.column("ts"), pa.timestamp("us")), unit="hour"
            ),
            pa.int64(),
        )
        g = pa.table({"hour_us": hour_us, "user_id": t.column("user_id")}).group_by(
            ["hour_us", "user_id"]
        ).aggregate([])
        upart = _user_part_ids(
            np.asarray(g.column("user_id").fill_null(-1), dtype=np.int64), num_parts
        )
        return g.append_column("upart", pa.array(upart, pa.int32()))

    def count_partition(g: pa.Table) -> pa.Table:
        d = (
            g.drop_columns(["upart"])
            .group_by(["hour_us", "user_id"])
            .aggregate([])
        )
        c = d.group_by(["hour_us"]).aggregate([("user_id", "count")])
        return c.rename_columns(["hour_us", "n"])

    from ..io_utils import null_safe_grouped_sum

    partials = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    per_part = partials.groupby("upart").map_groups(
        count_partition, batch_format="pyarrow"
    )
    # null-safe final merge (a NULL window key would ride a Ray groupby
    # otherwise — see io_utils.null_safe_kpart)
    out = null_safe_grouped_sum(
        per_part, ["hour_us"], [("n", "n_users")], num_parts=32
    )

    def to_ts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.cast(t.column("hour_us"), pa.timestamp("us")),
                "n_users": t.column("n_users"),
            }
        )

    return out.map_batches(to_ts, batch_format="pyarrow", zero_copy_batch=True)


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

    from ..io_utils import null_safe_grouped_sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return null_safe_grouped_sum(
        partials,
        ["event_type"],
        [("k_sum", "sum_k"), ("count_all", "n_events")],
        num_parts=32,
    )


def _user_part_ids(user: np.ndarray, num_parts: int) -> np.ndarray:
    """Bucket int64 user ids into num_parts partitions via a
    multiplicative (Fibonacci/Lehmer-style) mix of the id first — a raw
    `id % num_parts` leaves partitions empty on strided id sets (ADVICE
    r4). Deterministic and process-independent; co-location is the only
    requirement, so any fixed mix is correct."""
    h = user.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int32)


def _add_user_part(t: pa.Table, num_parts: int) -> pa.Table:
    part = _user_part_ids(np.asarray(t.column("user_id"), dtype=np.int64), num_parts)
    return t.append_column("upart", pa.array(part, pa.int32()))


def asof_view_before_click(sf_dir: str, num_parts: int = 64) -> rd.Dataset:
    """AS-OF JOIN (the custom operator Ray Data lacks): for every
    'click' event, the latest 'view' event of the same user with
    view.ts <= click.ts (ties: larger event_id wins), plus the gap in
    microseconds — the classic event-attribution as-of join.

    Shape: both sides hash-partitioned COARSELY by user (one shuffle);
    inside each partition the match is ONE vectorized merge-scan (sort
    both sides together, forward-fill the latest view index) — no
    per-user Python dispatch. Partitioning assumption (custom-operator
    rule): all events of one user share a partition — the same
    documented contract as sessionize(), salted escape hatch included."""
    ds = read_events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])

    def keep_sides(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column("event_type"), value_set=pa.array(["view", "click"]))
        # null partition keys are excluded by contract (documented with
        # the partitioning assumption; the oracle filters identically —
        # a null user/ts row can neither partition nor order)
        mask = pc.and_(
            mask,
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
        )
        return _add_user_part(t.filter(mask), num_parts)

    def asof_partition(g: pa.Table) -> pa.Table:
        # merge-scan: one sort of both sides by (user, ts, views-first,
        # event_id) then a forward-fill of the latest view index — at
        # equal ts views sort before clicks (<= is inclusive) and equal-
        # ts views sort event_id ascending, so the fill carries the
        # max-event_id tie winner. No composite-key bit packing → no
        # time-span/user-range limits.
        ts = np.asarray(g.column("ts").cast(pa.timestamp("us")).cast(pa.int64()))  # normalize to µs regardless of stored unit (ADVICE r3)
        user = np.asarray(g.column("user_id"), dtype=np.int64)
        eid = np.asarray(g.column("event_id"), dtype=np.int64)
        is_click = np.asarray(pc.equal(g.column("event_type"), "click")).astype(np.int8)
        order = np.lexsort((eid, is_click, ts, user))
        user, ts, eid, is_click = user[order], ts[order], eid[order], is_click[order]
        idx = np.arange(len(user))
        view_ptr = np.where(is_click == 0, idx, -1)
        filled = np.maximum.accumulate(view_ptr)
        clicks = np.flatnonzero(is_click == 1)
        vp = filled[clicks]
        # a fill carried over from the PREVIOUS user is invalid (view
        # indices only grow, so a cross-user carry shows a user mismatch)
        valid = (vp >= 0) & (user[np.maximum(vp, 0)] == user[clicks])
        vi = np.maximum(vp, 0)
        view_id = pa.array(np.where(valid, eid[vi], 0), pa.int64())
        gap = pa.array(np.where(valid, ts[clicks] - ts[vi], 0), pa.int64())
        vmask = pa.array(valid)
        nulls = pa.nulls(len(clicks), pa.int64())
        return pa.table(
            {
                "click_id": pa.array(eid[clicks], pa.int64()),
                "user_id": pa.array(user[clicks], pa.int64()),
                "view_id": pc.if_else(vmask, view_id, nulls),
                "gap_us": pc.if_else(vmask, gap, nulls),
            }
        )

    parted = ds.map_batches(keep_sides, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("upart").map_groups(asof_partition, batch_format="pyarrow")


ROLLING_WINDOW_DAYS = 3


def rolling_user_daily(sf_dir: str, num_parts: int = 64) -> rd.Dataset:
    """WINDOWED AGGREGATE (sliding window): per (user, day) spend plus
    the rolling sum over the user's last ROLLING_WINDOW_DAYS observed
    days (ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW semantics).

    Money is converted to integer cents (half-even) BEFORE summation so
    both engines add exact integers — a rolling double sum computed via
    cumsum differences would drift in the last bits vs the oracle's
    direct window sum. Shape: per-batch partial (user, day) cent sums →
    coarse user partitions → vectorized cumsum with per-user rebasing."""
    ds = read_events(sf_dir, columns=["ts", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        # events with a null value are excluded on BOTH sides (the SQL
        # twin filters them too): an all-null (user, day) group would
        # otherwise sum to NULL here and wrap to INT64_MIN through the
        # numpy cast, silently poisoning the rolling window. Null
        # user/ts rows are excluded by the same documented contract as
        # asof/sessionize (they can neither partition nor window).
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("value")),
                pc.and_(
                    pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))
                ),
            )
        )
        from ..io_utils import money_units

        day = pc.floor_temporal(t.column("ts"), unit="day")
        cents = money_units(t.column("value"))
        g = pa.table(
            {"user_id": t.column("user_id"), "day": day, "cents": cents}
        )
        out = pa.TableGroupBy(g, ["user_id", "day"]).aggregate([("cents", "sum")])
        return _add_user_part(out.rename_columns(["user_id", "day", "day_cents"]), num_parts)

    def rolling_partition(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["upart"])
        # complete the (user, day) aggregation within the partition
        t = (
            pa.TableGroupBy(t, ["user_id", "day"])
            .aggregate([("day_cents", "sum")])
            .rename_columns(["user_id", "day", "day_cents"])
        )
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        day = np.asarray(t.column("day").cast(pa.int64()))
        cents = np.asarray(t.column("day_cents"), dtype=np.int64)
        order = np.lexsort((day, user))
        user, day, cents = user[order], day[order], cents[order]
        cs = np.concatenate([[0], np.cumsum(cents)])
        idx = np.arange(len(user))
        user_start = idx[np.concatenate([[True], user[1:] != user[:-1]])]
        start_of_row = user_start[np.cumsum(np.concatenate([[True], user[1:] != user[:-1]])) - 1]
        lo = np.maximum(idx - (ROLLING_WINDOW_DAYS - 1), start_of_row)
        rolling = cs[idx + 1] - cs[lo]
        return pa.table(
            {
                "user_id": pa.array(user, pa.int64()),
                "day": pa.array(day).cast(pa.timestamp("us")),
                "day_cents": pa.array(cents, pa.int64()),
                "rolling3_cents": pa.array(rolling, pa.int64()),
            }
        )

    parted = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("upart").map_groups(rolling_partition, batch_format="pyarrow")


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
        # null partition keys are excluded by contract (see asof/rolling
        # — the oracle filters identically)
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        return _add_user_part(t, num_parts)

    def sessionize_partition(g: pa.Table) -> pa.Table:
        # one numpy pass for ALL users of the partition (the asof/
        # rolling pattern): lexsort by (user, ts, event_id), session
        # boundaries = user change OR gap > threshold, segment sums via
        # add.reduceat — no pandas, no per-user dispatch.
        n = g.num_rows
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sum_value_cents": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
            }
        )
        if n == 0:
            return empty
        ts = np.asarray(g.column("ts").cast(pa.timestamp("us")).cast(pa.int64()))  # normalize to µs regardless of stored unit (ADVICE r3)
        user = np.asarray(g.column("user_id"), dtype=np.int64)
        eid = np.asarray(g.column("event_id"), dtype=np.int64)
        # money sums in integer CENTS, rounded per value BEFORE summing
        # (the events_rolling discipline): a float session sum is
        # summation-order-sensitive, and a half-even cent rounding of it
        # measurably flips at .5 boundaries between numpy's reduceat
        # order and DuckDB's scan order (caught by tools/fuzz_oracles).
        # null ≡ additive zero (≡ SQL sum's null-skip).
        from ..io_utils import money_units

        cents = money_units(g.column("value").cast(pa.float64()))
        vals = np.asarray(pc.fill_null(cents, 0), dtype=np.int64)
        order = np.lexsort((eid, ts, user))
        user, ts, vals = user[order], ts[order], vals[order]
        new_user = np.concatenate([[True], user[1:] != user[:-1]])
        gap_us = np.concatenate([[0], ts[1:] - ts[:-1]])
        new_session = new_user | (gap_us > SESSION_GAP_MINUTES * 60 * 1_000_000)
        starts = np.flatnonzero(new_session)
        # session_idx = per-user ordinal of the session (0-based): global
        # segment ordinal re-based at each user's first segment
        seg_user = user[starts]
        seg_new_user = np.concatenate([[True], seg_user[1:] != seg_user[:-1]])
        seg_ord = np.arange(len(starts), dtype=np.int64)
        seg_base = seg_ord[seg_new_user][np.cumsum(seg_new_user) - 1]
        return pa.table(
            {
                "user_id": pa.array(seg_user, pa.int64()),
                "session_idx": pa.array(seg_ord - seg_base, pa.int64()),
                "n_events": pa.array(
                    np.diff(np.concatenate([starts, [n]])), pa.int64()
                ),
                "sum_value_cents": pa.array(np.add.reduceat(vals, starts), pa.int64()),
                "session_start": pa.array(ts[starts]).cast(pa.timestamp("us")),
            }
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("upart").map_groups(sessionize_partition, batch_format="pyarrow")


def _events_ts_range_us(path: str) -> tuple[int, int]:
    """(min, max) of the ts column in µs from parquet row-group
    statistics — no data scan. Falls back to a narrow single-column
    read only when a writer omitted stats (rare; documented cost:
    one ts-column scan)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    ci = f.schema_arrow.get_field_index("ts")
    unit = f.schema_arrow.field("ts").type.unit
    mins, maxs = [], []
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            t = pq.read_table(path, columns=["ts"])
            mm = pc.min_max(pc.cast(t.column("ts"), pa.timestamp("us")))
            return mm["min"].cast(pa.int64()).as_py(), mm["max"].cast(pa.int64()).as_py()
        mins.append(st.min)
        maxs.append(st.max)
    scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[unit]
    lo = min(pa.scalar(v, pa.timestamp(unit)).cast(pa.int64()).as_py() for v in mins)
    hi = max(pa.scalar(v, pa.timestamp(unit)).cast(pa.int64()).as_py() for v in maxs)
    if scale is None:
        return lo // 1_000, hi // 1_000
    return lo * scale, hi * scale


def sessionize_salted(sf_dir: str, num_parts: int = 64, time_salt: int = 8) -> rd.Dataset:
    """Skew-hardened :func:`sessionize`: a mega-user (bot traffic)
    holding a large share of events straggles the one partition that
    owns it, exactly like the flagship's mega-conversation. The salted
    escape hatch splits every user's events into `time_salt` disjoint
    TIME chunks (chunk = (ts - min_ts) // span — a function of ts, so
    chunk-local order is globally contiguous per user), sessionizes
    each (user-partition, chunk) independently with the same vectorized
    pass, then merges at SESSION granularity: per user, order partials
    by start, merge neighbors whose start−prev_end ≤ gap — the identical
    session rule, applied to rows that number sessions (≪ events), so
    the mega-user's phase-2 group is small even though its event set
    was huge. Output is row-identical to sessionize() (pinned by
    test_sessionize_salted_equals_unsalted)."""
    ds = read_events(sf_dir, columns=["ts", "user_id", "event_id", "value"])
    lo_us, hi_us = _events_ts_range_us(os.path.join(sf_dir, "events.parquet"))
    span = max(1, (hi_us - lo_us + time_salt) // time_salt)

    def add_part(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        ts_us = np.asarray(t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()))
        chunk = np.clip((ts_us - lo_us) // span, 0, time_salt - 1)
        upart = _user_part_ids(
            np.asarray(t.column("user_id"), dtype=np.int64), num_parts
        ).astype(np.int64)
        return t.append_column(
            "upc", pa.array((upart * time_salt + chunk).astype(np.int32), pa.int32())
        ).append_column("upart", pa.array(upart.astype(np.int32), pa.int32()))

    def partial_sessions(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sum_value_cents": pa.array([], pa.int64()),
                "upart": pa.array([], pa.int32()),
            }
        )
        if n == 0:
            return empty
        from ..io_utils import money_units

        ts = np.asarray(g.column("ts").cast(pa.timestamp("us")).cast(pa.int64()))
        user = np.asarray(g.column("user_id"), dtype=np.int64)
        eid = np.asarray(g.column("event_id"), dtype=np.int64)
        vals = np.asarray(
            pc.fill_null(money_units(g.column("value").cast(pa.float64())), 0),
            dtype=np.int64,
        )
        upart = np.asarray(g.column("upart"), dtype=np.int32)
        order = np.lexsort((eid, ts, user))
        user, ts, vals, upart = user[order], ts[order], vals[order], upart[order]
        new_user = np.concatenate([[True], user[1:] != user[:-1]])
        gap_us = np.concatenate([[0], ts[1:] - ts[:-1]])
        new_session = new_user | (gap_us > SESSION_GAP_MINUTES * 60 * 1_000_000)
        starts = np.flatnonzero(new_session)
        ends = np.concatenate([starts[1:], [n]]) - 1
        return pa.table(
            {
                "user_id": pa.array(user[starts], pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends], pa.int64()),
                "n_events": pa.array(np.diff(np.concatenate([starts, [n]])), pa.int64()),
                "sum_value_cents": pa.array(np.add.reduceat(vals, starts), pa.int64()),
                "upart": pa.array(upart[starts], pa.int32()),
            }
        )

    def merge_sessions(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["upart"])
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sum_value_cents": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
            }
        )
        if t.num_rows == 0:
            return empty
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        start = np.asarray(t.column("start_us"), dtype=np.int64)
        end = np.asarray(t.column("end_us"), dtype=np.int64)
        nev = np.asarray(t.column("n_events"), dtype=np.int64)
        cents = np.asarray(t.column("sum_value_cents"), dtype=np.int64)
        order = np.lexsort((start, user))
        user, start, end, nev, cents = (
            user[order], start[order], end[order], nev[order], cents[order]
        )
        new_user = np.concatenate([[True], user[1:] != user[:-1]])
        gap_us = np.concatenate([[0], start[1:] - end[:-1]])
        new_session = new_user | (gap_us > SESSION_GAP_MINUTES * 60 * 1_000_000)
        seg = np.flatnonzero(new_session)
        seg_user = user[seg]
        seg_new_user = np.concatenate([[True], seg_user[1:] != seg_user[:-1]])
        seg_ord = np.arange(len(seg), dtype=np.int64)
        seg_base = seg_ord[seg_new_user][np.cumsum(seg_new_user) - 1]
        return pa.table(
            {
                "user_id": pa.array(seg_user, pa.int64()),
                "session_idx": pa.array(seg_ord - seg_base, pa.int64()),
                "n_events": pa.array(np.add.reduceat(nev, seg), pa.int64()),
                "sum_value_cents": pa.array(np.add.reduceat(cents, seg), pa.int64()),
                "session_start": pa.array(start[seg]).cast(pa.timestamp("us")),
            }
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    partials = parted.groupby("upc").map_groups(
        lambda g: partial_sessions(g.drop_columns(["upc"])), batch_format="pyarrow"
    )
    return partials.groupby("upart").map_groups(merge_sessions, batch_format="pyarrow")
