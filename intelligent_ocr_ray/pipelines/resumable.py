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


def _filter_pending(pending: set[int]):
    def f(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column("part"), value_set=pa.array(sorted(pending), pa.int32()))
        return t.filter(mask)

    return f


def _write_partition(group: pa.Table, out_dir: str) -> pa.Table:
    """map_groups fn: sort the partition, write it to a _tmp dir, return
    a one-row summary (the driver does the atomic commit). Workers write
    directly to out_dir — on a real cluster that directory must be
    shared storage (object store/NFS), same as any distributed sink."""
    t0 = time.perf_counter()
    part = int(group.column("part")[0].as_py())
    body = sort_within_batch(group.drop_columns(["part"]))
    tmp = os.path.join(out_dir, f"_tmp-part={part:04d}")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(body, os.path.join(tmp, "data.parquet"))
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "rows": pa.array([body.num_rows], pa.int64()),
            "tmp_dir": pa.array([tmp], pa.string()),
            "seconds": pa.array([time.perf_counter() - t0], pa.float64()),
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
) -> tuple[bool, Exception | None]:
    """One pass over the manifest's pending partitions under one config
    profile. Partitions are committed AS THEY COMPLETE (streaming
    consumption of the per-partition summaries), so a crash or timeout
    mid-attempt loses only in-flight work. Returns (completed, error):
    completed=True means the pass drained every pending partition."""
    import queue
    import threading

    pending = set(manifest.pending())
    ds = read_transcripts(input_path)
    ds = ds.map_batches(
        add_partition_column,
        fn_kwargs={"num_parts": num_parts, "salt_turns": salt_turns},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if len(pending) < num_parts:
        # resume anti-join: done partitions never leave the read stage
        ds = ds.map_batches(
            _filter_pending(pending), batch_format="pyarrow", zero_copy_batch=True
        )
    extracted = extract_fn(ds, config, batch_size=batch_size, concurrency=concurrency)
    # ExtractTurns drops auxiliary columns; recompute the partition key
    # from (conv_id, turn_idx) — same deterministic hash + salt.
    extracted = extracted.map_batches(
        add_partition_column,
        fn_kwargs={"num_parts": num_parts, "salt_turns": salt_turns},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    summaries = extracted.groupby("part").map_groups(
        functools.partial(_write_partition, out_dir=out_dir),
        batch_format="pyarrow",
    )

    # Streaming consumption with an inactivity watchdog (R4 analog of
    # the reference's 1800 s per-task daemon-thread timeout,
    # core/task_manager.py:288,313-332): the iterator runs in a helper
    # thread; if no partition summary lands within partition_timeout_s
    # the attempt is declared hung and abandoned (Ray's own task retries
    # cover transient faults below this layer).
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
    while True:
        try:
            kind, payload = q.get(timeout=partition_timeout_s)
        except queue.Empty:
            return False, TimeoutError(
                f"no partition completed within {partition_timeout_s}s"
            )
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
        )
        seen.add(part)
        if progress_callback is not None:
            done_n = len(manifest.done)
            elapsed = time.perf_counter() - run_t0
            rate = done_n / elapsed if elapsed > 0 else 0.0
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
    # partitions with no rows at all still count as done (empty)
    for part in sorted(pending - seen):
        tmp = os.path.join(out_dir, f"_tmp-part={part:04d}")
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

    ``partition_timeout_s`` (R4): inactivity watchdog — if no partition
    commits within the budget the attempt is declared hung and abandoned
    (core/task_manager.py:288,313-332 analog). ``degraded_rerun`` (task-
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
    every partition commit."""
    from ..functions.extract import degraded_ladder

    files = list_parquet_files(input_path)
    in_fp = input_fingerprint(files)
    config_fp = config.fingerprint() + (f"+salt{salt_turns}" if salt_turns else "")
    manifest = RunManifest(out_dir, num_parts, in_fp, config_fp)
    if not manifest.pending():
        return manifest

    run_t0 = time.perf_counter()
    profiles: list[tuple[str | None, ExtractorConfig]] = [(None, config)]
    if degraded_rerun:
        profiles += [
            (f"degraded[{k}]:{cfg.fingerprint()}", cfg)
            for k, cfg in enumerate(degraded_ladder(config))
        ]
    last_err: Exception | None = None
    for profile, cfg in profiles:
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
        )
        if completed:
            break
    if manifest.pending() and last_err is not None:
        raise RuntimeError(
            f"{len(manifest.pending())} partitions failed every profile"
        ) from last_err

    # run metrics (S8 JSONL-log analog): per-(status, route) counters of
    # the committed output, one parquet per run under metrics/
    try:
        from .metrics import status_profile, write_run_metrics

        write_run_metrics(
            status_profile(read_output(out_dir)),
            os.path.join(out_dir, "metrics", "run_metrics.parquet"),
            {"run_id": in_fp, "config_fp": config.fingerprint()},
        )
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
