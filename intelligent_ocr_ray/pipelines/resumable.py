"""Resumable flagship run: partitioned extraction with per-partition
atomic commits, manifest lineage, and a completeness audit.

Flow (engine analog of process_file_pipelined's checkpoint/resume path,
core/pdf_processor.py:1083-1143 + 1585-1603):

  read → add part=hash(conv_id)%P → anti-join vs manifest done-set
       → unified extractor (actor pool) → groupby(part)
       → per-partition: sort by (conv_id, turn_idx), write to _tmp dir
       → driver: atomic rename + manifest commit per partition
       → completeness audit (input rows == sum of committed rows)

Partitioning contract: partitions are keyed by conv_id hash (UNSALTED
here so each conversation lands wholly in one partition and the
in-partition sort yields exact (conv_id, turn_idx) order). Size P so a
partition fits a worker's heap (P >= 4 × max parallelism; at 100 TB
pick P so partition ≈ 256-512 MB). Skewed mega-conversations bound a
partition's floor size — if one conversation outgrows a partition,
switch the wide stage to the salted keys in pipelines/ordering.py and
merge order at read time.
"""

from __future__ import annotations

import functools
import logging
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import DEFAULT_CONFIG, ExtractorConfig
from ..state.manifest import RunManifest, input_fingerprint, list_parquet_files
from .extract import extract_dataset, read_transcripts
from .ordering import add_partition_column, sort_within_batch

logger = logging.getLogger(__name__)

# Partition files are zstd-compressed: extracted text compresses ~25%
# smaller than snappy at comparable encode speed, and the write path is
# disk-bandwidth-sensitive at high parallelism (measured: 16M-turn fused
# run 21-24 s snappy → 18.3 s zstd at 32 CPUs; BENCH/BASELINE.md).
PARTITION_CODEC = "zstd"


def suggest_layout(
    input_path: str,
    *,
    rows_per_partition: int = 62_500,
    rows_per_read_block: int = 250_000,
    min_parts: int = 32,
    min_blocks: int = 8,
) -> tuple[int, int]:
    """(num_parts, read_num_blocks) sized from the input's parquet
    metadata — block counts must scale with DATA, not with CPUs: Ray's
    CPU-proportional defaults make partition tasks ever chunkier as the
    corpus grows (measured: a fixed 256/64 layout turned a 2× corpus
    into a superlinear 3.2× wall at 32 CPUs; re-sizing restored linear).
    ~62.5k rows/partition ≈ 20 MB input / 60 MB output per task and
    ~250k rows ≈ 80 MB per read block — both fit worker heaps with
    wide headroom at any corpus size, and partition count stays ≥ 4×
    any plausible parallelism."""
    import math

    import pyarrow.parquet as pq

    n_rows = sum(pq.read_metadata(p).num_rows for p in list_parquet_files(input_path))
    parts = max(min_parts, math.ceil(n_rows / rows_per_partition))
    blocks = max(min_blocks, math.ceil(n_rows / rows_per_read_block))
    return parts, blocks


def _heartbeat_sink_cls():
    """Attempt-scoped PROGRESS sink (lazy ray.remote wrapper so module
    import never touches Ray): map batches and partition tasks ping as
    units of work COMPLETE, so the driver's watchdog measures
    time-since-last-signal instead of sizing partition_timeout_s to the
    whole phase (round-2 verdict: the old inactivity clock only started
    once the upstream shuffle cleared). A slow-but-progressing phase
    keeps pinging and is never killed; a genuinely hung task stops
    pinging and trips the budget. Wall-clock (time.time) is used on
    both sides — coarse timeouts tolerate normal cluster clock skew."""
    import ray

    @ray.remote(num_cpus=0)
    class _HeartbeatSink:
        def __init__(self):
            self._last = time.time()
            self._n = 0

        def ping(self, n: int = 1) -> None:
            self._last = time.time()
            self._n += n

        def snapshot(self) -> tuple[float, int]:
            return self._last, self._n

    return _HeartbeatSink


def _cancel_executor(ds) -> bool:
    """Best-effort cancel of a hung Dataset execution via the Dataset's
    own cleanup path (``_current_executor.shutdown(force=True)``) so
    abandoned tasks don't outlive the attempt. The attr is PRIVATE
    (present on ray 2.49; tests/test_watchdog.py pins its existence so
    an upgrade that moves it fails the suite loudly, and pins this
    guard's logged-no-op on absence): a Ray version without it degrades
    to a LOGGED no-op, never silent zombie tasks — correctness stays
    safe either way because attempt-scoped tmp dirs mean abandoned
    writers can't corrupt a commit. Returns True iff a shutdown was
    actually issued."""
    ex = getattr(ds, "_current_executor", None)
    if ex is None:
        logger.warning(
            "watchdog: Dataset._current_executor unavailable on this "
            "Ray version; cannot cancel the hung attempt's tasks — "
            "they will idle out with the attempt"
        )
        return False
    try:
        ex.shutdown(force=True)
        return True
    except Exception:  # noqa: BLE001 — cancellation is advisory
        logger.warning("watchdog: executor shutdown failed", exc_info=True)
        return False


def _filter_pending(pending: set[int]):
    def f(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column("part"), value_set=pa.array(sorted(pending), pa.int32()))
        return t.filter(mask)

    return f


def _profile_counters(body: pa.Table) -> str:
    """JSON {'status|route': n} counters for one partition's output —
    the in-pass ProcessResult accumulation (core/pdf_processor.py:37-102
    analog): metrics ride the summary row instead of a second full read
    of the output."""
    import json as _json

    g = body.group_by(["status", "route"]).aggregate([([], "count_all")])
    return _json.dumps(
        {
            f"{st}|{rt}": int(n)
            for st, rt, n in zip(
                g.column("status").to_pylist(),
                g.column("route").to_pylist(),
                g.column("count_all").to_pylist(),
            )
        }
    )


def _extract_write_partition(
    group: pa.Table, out_dir: str, config: ExtractorConfig, use_ladder: bool,
    tmp_tag: str = "", hb=None,
) -> pa.Table:
    """FUSED partition task: sort the narrow input partition, run the
    (process-cached) extractor, write — one task does everything for its
    partition. This is the scale-out layout: the only exchange in the
    whole job is the narrow input's hash-partition shuffle on an int
    key; per-partition sort/extract/write are embarrassingly parallel
    with no barrier, so the fixed sort-floor of the global-order path
    disappears. Output rows are identical to the unfused path (same
    in-partition (conv_id, turn_idx) order, same extractor)."""
    from ..stages.extractor import extract_batch

    t0 = time.perf_counter()
    part = int(group.column("part")[0].as_py())
    if hb is not None:  # progress signal: this partition left the shuffle
        hb.ping.remote()
    narrow = sort_within_batch(group.drop_columns(["part"]))
    body = extract_batch(narrow, config, use_ladder=use_ladder)
    if hb is not None:  # progress signal: extract done, write starting
        hb.ping.remote()
    # attempt-scoped tmp dir: a zombie task abandoned by the watchdog
    # keeps writing its OWN attempt's prefix and can never race a later
    # attempt's files (the stale dirs are swept on the next resume)
    tmp = os.path.join(out_dir, f"_tmp{tmp_tag}-part={part:04d}")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(body, os.path.join(tmp, "data.parquet"), compression=PARTITION_CODEC)
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "rows": pa.array([body.num_rows], pa.int64()),
            "tmp_dir": pa.array([tmp], pa.string()),
            "seconds": pa.array([time.perf_counter() - t0], pa.float64()),
            "counters": pa.array([_profile_counters(body)], pa.string()),
        }
    )


def _write_partition(group: pa.Table, out_dir: str, tmp_tag: str = "", hb=None) -> pa.Table:
    """map_groups fn: sort the partition, write it to a _tmp dir, return
    a one-row summary (the driver does the atomic commit). Workers write
    directly to out_dir — on a real cluster that directory must be
    shared storage (object store/NFS), same as any distributed sink."""
    t0 = time.perf_counter()
    part = int(group.column("part")[0].as_py())
    if hb is not None:  # progress signal: this partition left the shuffle
        hb.ping.remote()
    body = sort_within_batch(group.drop_columns(["part"]))
    tmp = os.path.join(out_dir, f"_tmp{tmp_tag}-part={part:04d}")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(body, os.path.join(tmp, "data.parquet"), compression=PARTITION_CODEC)
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "rows": pa.array([body.num_rows], pa.int64()),
            "tmp_dir": pa.array([tmp], pa.string()),
            "seconds": pa.array([time.perf_counter() - t0], pa.float64()),
            "counters": pa.array([_profile_counters(body)], pa.string()),
        }
    )


def _attempt(
    input_path: str,
    manifest: RunManifest,
    out_dir: str,
    config: ExtractorConfig,
    *,
    num_parts: int,
    batch_size: int,
    concurrency,
    salt_turns: int | None,
    extract_fn,
    partition_timeout_s: float | None,
    progress_callback,
    profile: str | None,
    run_t0: float,
    total_parts: int,
    fuse_extract: bool,
    use_ladder: bool,
    read_num_blocks: int | None,
    tmp_tag: str,
) -> tuple[bool, Exception | None]:
    """One pass over the manifest's pending partitions under one config
    profile. Partitions are committed AS THEY COMPLETE (streaming
    consumption of the per-partition summaries), so a crash or timeout
    mid-attempt loses only in-flight work. Returns (completed, error):
    completed=True means the pass drained every pending partition."""
    import queue
    import threading

    pending = set(manifest.pending())
    # progress heartbeat (only when a watchdog budget is set — zero
    # overhead otherwise): map batches ping as they COMPLETE, partition
    # tasks ping at start and mid-task, commits reset the clock too
    hb = None
    if partition_timeout_s is not None:
        hb = _heartbeat_sink_cls().remote()

    ds = read_transcripts(input_path, read_num_blocks)
    ds = ds.map_batches(
        add_partition_column,
        fn_kwargs={"num_parts": num_parts, "salt_turns": salt_turns},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if hb is not None:
        hb_ref = hb  # close over the handle, not the dataset

        def _ping_batch(t: pa.Table) -> pa.Table:
            # fires AFTER the upstream fused work for this batch ran —
            # a completed unit of map progress (fire-and-forget)
            hb_ref.ping.remote()
            return t

        ds = ds.map_batches(_ping_batch, batch_format="pyarrow", zero_copy_batch=True)
    if len(pending) < num_parts:
        # resume anti-join: done partitions never leave the read stage
        ds = ds.map_batches(
            _filter_pending(pending), batch_format="pyarrow", zero_copy_batch=True
        )
    if fuse_extract and extract_fn is extract_dataset:
        # fused layout: shuffle the NARROW input by the int partition
        # key, then sort+extract+write inside each partition task — no
        # global sort, no second wide shuffle, no barrier between
        # partitions (the 100-TB layout; see _extract_write_partition)
        summaries = ds.groupby("part").map_groups(
            functools.partial(
                _extract_write_partition,
                out_dir=out_dir,
                config=config,
                use_ladder=use_ladder,
                tmp_tag=tmp_tag,
                hb=hb,
            ),
            batch_format="pyarrow",
        )
    else:
        if extract_fn is extract_dataset:
            # forward the ladder flag (custom extract_fn hooks own their
            # own retry semantics and keep the narrower signature)
            extracted = extract_fn(
                ds, config, batch_size=batch_size, concurrency=concurrency,
                use_ladder=use_ladder,
            )
        else:
            extracted = extract_fn(
                ds, config, batch_size=batch_size, concurrency=concurrency
            )
        # ExtractTurns drops auxiliary columns; recompute the partition
        # key from (conv_id, turn_idx) — same deterministic hash + salt.
        extracted = extracted.map_batches(
            add_partition_column,
            fn_kwargs={"num_parts": num_parts, "salt_turns": salt_turns},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        summaries = extracted.groupby("part").map_groups(
            functools.partial(_write_partition, out_dir=out_dir, tmp_tag=tmp_tag, hb=hb),
            batch_format="pyarrow",
        )

    # Streaming consumption with a PROGRESS watchdog (R4 analog of the
    # reference's 1800 s per-task daemon-thread timeout,
    # core/task_manager.py:288,313-332): the iterator runs in a helper
    # thread; the attempt is declared hung only when partition_timeout_s
    # elapses with NO signal at all — no committed partition, no map
    # batch completed, no partition task started (the heartbeat sink) —
    # so the budget bounds per-unit work, not the whole phase: a long
    # healthy shuffle keeps pinging and never false-triggers.
    q: queue.Queue = queue.Queue()

    def consume():
        try:
            for row in summaries.iter_rows():
                q.put(("row", row))
            q.put(("done", None))
        except BaseException as e:  # noqa: BLE001 — surfaced to the driver loop
            q.put(("err", e))

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    seen: set[int] = set()
    last_signal = time.time()
    poll_s = None if partition_timeout_s is None else min(2.0, partition_timeout_s / 4)
    while True:
        try:
            kind, payload = q.get(timeout=poll_s)
        except queue.Empty:
            now = time.time()
            if hb is not None:
                try:
                    import ray

                    hb_last, _ = ray.get(hb.snapshot.remote(), timeout=5)
                    last_signal = max(last_signal, hb_last)
                except Exception:  # noqa: BLE001 — a dead sink means no signals
                    logger.warning("watchdog: heartbeat sink unreachable", exc_info=True)
            if now - last_signal <= partition_timeout_s:
                continue  # progress within budget — keep waiting
            _cancel_executor(summaries)
            return False, TimeoutError(
                f"no progress signal within {partition_timeout_s}s"
            )
        last_signal = time.time()
        if kind == "err":
            return False, payload
        if kind == "done":
            break
        part = int(payload["part"])
        manifest.commit_partition(
            part,
            payload["tmp_dir"],
            int(payload["rows"]),
            float(payload["seconds"]),
            profile=profile,
            counters=payload.get("counters"),
        )
        seen.add(part)
        if progress_callback is not None:
            done_n = len(manifest.done)
            elapsed = time.perf_counter() - run_t0
            rate = done_n / elapsed if elapsed > 0 else 0.0
            try:
                progress_callback(
                    {
                        "partition": part,
                        "done": done_n,
                        "total": total_parts,
                        "rows": manifest.total_rows(),
                        "elapsed_s": round(elapsed, 3),
                        "eta_s": round((total_parts - done_n) / rate, 3) if rate else None,
                        "profile": profile,
                    }
                )
            except Exception:  # noqa: BLE001 — progress is advisory; never fail the run
                pass
    # partitions with no rows at all still count as done (empty)
    for part in sorted(pending - seen):
        tmp = os.path.join(out_dir, f"_tmp{tmp_tag}-part={part:04d}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        manifest.commit_partition(part, tmp, 0, 0.0, profile=profile)
    return True, None


def run_resumable(
    input_path: str,
    out_dir: str,
    config: ExtractorConfig = DEFAULT_CONFIG,
    *,
    num_parts: int = 32,
    batch_size: int = 4096,
    concurrency: int | tuple[int, int] | None = None,
    salt_turns: int | None = None,
    partition_timeout_s: float | None = None,
    degraded_rerun: bool = False,
    extract_fn=extract_dataset,
    progress_callback=None,
    fuse_extract: bool = False,
    use_ladder: bool = False,
    read_num_blocks: int | None = None,
) -> RunManifest:
    """Run (or resume) the flagship extraction into a partitioned,
    manifest-tracked output directory. Idempotent: a complete run
    returns immediately; a partial run processes only pending
    partitions; changed input/config fingerprints invalidate and
    restart (core/checkpoint.py:220-225 semantics).

    ``salt_turns``: skew escape hatch (north rule's explicit
    mega-conversation handling). With a salt, partition key =
    hash(conv_id, turn_idx // salt_turns) so no single conversation can
    pin one reducer/partition; each output file is still internally
    (conv_id, turn_idx)-sorted, but a conversation's chunks now span
    partitions — consumers needing whole-conversation contiguity must
    merge chunks (read_output(...).sort(...)), the documented partial-
    order trade every salted layout makes.

    ``partition_timeout_s`` (R4): PROGRESS watchdog — the attempt is
    declared hung and abandoned only after the budget elapses with no
    signal at all: no partition commit, no completed map batch, and no
    partition task started (a 0-CPU heartbeat actor collects worker
    pings; core/task_manager.py:288,313-332 analog). Size the budget to
    the longest single UNIT of work (one batch / one partition task),
    not the whole phase — a long healthy shuffle keeps signalling and
    never false-triggers. ``degraded_rerun`` (task-
    level R3, desktop/workers.py:357-389 analog): after a failed or hung
    attempt, the STILL-PENDING partitions are rerun under each
    progressively-degraded ladder profile (functions.extract.
    degraded_ladder); partitions recovered that way carry a ``profile``
    lineage entry in the manifest. Committed partitions are never
    reprocessed — commits stream as partitions complete.

    ``extract_fn(ds, config, *, batch_size, concurrency)``: extension
    hook (§2.11) for a custom extraction stage; defaults to the unified
    extractor. ``progress_callback(info_dict)``: in-run progress/ETA
    surface (A4 analog of core/parallel_ocr.py:492-504), invoked after
    every partition commit.

    ``fuse_extract=True``: the scale-out fast path — ONE narrow-input
    hash shuffle on the int partition key, then sort + extract + write
    fused inside each partition task (no global sort, no wide shuffle,
    no inter-partition barrier). Identical output rows; requires the
    default extract_fn. ``use_ladder`` enables the per-row R3 ladder in
    the fused extractor. ``read_num_blocks`` controls the read/map block
    count — the partition shuffle's cost scales with map-block ×
    reduce-partition PAIRS, and ~2× the CPU count measured best
    (BENCH/BASELINE.md)."""
    from ..functions.extract import degraded_ladder

    files = list_parquet_files(input_path)
    in_fp = input_fingerprint(files)
    config_fp = config.fingerprint() + (f"+salt{salt_turns}" if salt_turns else "")
    manifest = RunManifest(out_dir, num_parts, in_fp, config_fp)
    if not manifest.pending():
        return manifest

    # sweep stale tmp dirs from crashed/abandoned attempts of prior runs
    for name in os.listdir(out_dir):
        if name.startswith("_tmp"):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)

    run_t0 = time.perf_counter()
    profiles: list[tuple[str | None, ExtractorConfig]] = [(None, config)]
    if degraded_rerun:
        profiles += [
            (f"degraded[{k}]:{cfg.fingerprint()}", cfg)
            for k, cfg in enumerate(degraded_ladder(config))
        ]
    last_err: Exception | None = None
    for attempt_i, (profile, cfg) in enumerate(profiles):
        if not manifest.pending():
            break
        completed, last_err = _attempt(
            input_path,
            manifest,
            out_dir,
            cfg,
            num_parts=num_parts,
            batch_size=batch_size,
            concurrency=concurrency,
            salt_turns=salt_turns,
            extract_fn=extract_fn,
            partition_timeout_s=partition_timeout_s,
            progress_callback=progress_callback,
            profile=profile,
            run_t0=run_t0,
            total_parts=num_parts,
            fuse_extract=fuse_extract,
            use_ladder=use_ladder,
            read_num_blocks=read_num_blocks,
            tmp_tag=f"-a{attempt_i}",
        )
        if completed:
            break
    if manifest.pending() and last_err is not None:
        raise RuntimeError(
            f"{len(manifest.pending())} partitions failed every profile"
        ) from last_err

    # run metrics (S8 JSONL-log analog): per-(status, route) counters,
    # aggregated from the counters each partition task computed IN-PASS
    # (no second read of the committed output — at 16M turns the old
    # re-read pass alone cost more than the whole extraction)
    try:
        counts = manifest.profile_counts()
        if counts:
            keys = sorted(counts)
            t = pa.table(
                {
                    "status": pa.array([k[0] for k in keys], pa.string()),
                    "route": pa.array([k[1] for k in keys], pa.string()),
                    "n": pa.array([counts[k] for k in keys], pa.int64()),
                    "run_id": pa.array([in_fp] * len(keys), pa.string()),
                    "config_fp": pa.array(
                        [config.fingerprint()] * len(keys), pa.string()
                    ),
                }
            )
            mpath = os.path.join(out_dir, "metrics", "run_metrics.parquet")
            os.makedirs(os.path.dirname(mpath), exist_ok=True)
            pq.write_table(t, mpath)
    except Exception:  # noqa: BLE001 — metrics are advisory, never fail a run
        pass
    return manifest


def audit_completeness(input_path: str, manifest: RunManifest) -> tuple[bool, int, int]:
    """A5 analog (core/pdf_processor.py:1585-1603): every input turn
    must appear in the committed output. Parquet metadata count — no
    data read."""
    rows_in = sum(
        pq.read_metadata(p).num_rows for p in list_parquet_files(input_path)
    )
    rows_out = manifest.total_rows()
    return rows_in == rows_out, rows_in, rows_out


def read_output(out_dir: str):
    """Read a committed (possibly partial) run's output as a Dataset."""
    import ray.data as rd

    files = [
        os.path.join(out_dir, d, f)
        for d in sorted(os.listdir(out_dir))
        if d.startswith("part=")
        for f in sorted(os.listdir(os.path.join(out_dir, d)))
        if f.endswith(".parquet")
    ]
    return rd.read_parquet(files)
