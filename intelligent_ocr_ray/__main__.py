"""CLI — the engine's `python main.py input.pdf` analog
(reference: main.py:77-98 cli_process → processor pipeline; ours:
`python -m intelligent_ocr_ray run --input DIR --out DIR`).

Owns the Ray session (guarded init), like bench.py; the library never
calls ray.init itself.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    return ray


def cmd_run(args) -> int:
    from .config import DEFAULT_CONFIG
    from .pipelines.resumable import audit_completeness, run_resumable, suggest_layout
    from .state.manifest import validate_transcripts

    ok, msg = validate_transcripts(args.input)
    if not ok:
        print(f"invalid input: {msg}", file=sys.stderr)
        return 2
    read_blocks = None
    if args.num_parts is None:
        # size the layout from the input, not the CPU count
        args.num_parts, read_blocks = suggest_layout(args.input)
    ray = _ray_init(args.num_cpus)
    progress_cb = None
    if args.progress:
        # in-run progress/ETA lines (A4 analog, core/parallel_ocr.py:492-504)
        def progress_cb(info):
            print(json.dumps({"event": "partition_done", **info}), flush=True)

    try:
        manifest = run_resumable(
            args.input,
            args.out,
            DEFAULT_CONFIG,
            num_parts=args.num_parts,
            partition_timeout_s=args.partition_timeout,
            degraded_rerun=args.degraded_rerun,
            progress_callback=progress_cb,
            fuse_extract=args.fuse,
            salt_turns=args.salt_turns,
            read_num_blocks=read_blocks,
        )
        complete, n_in, n_out = audit_completeness(args.input, manifest)
        print(
            json.dumps(
                {
                    "complete": complete,
                    "rows_in": n_in,
                    "rows_out": n_out,
                    "partitions": manifest.num_parts,
                    "progress": manifest.progress(),
                }
            )
        )
        return 0 if complete else 1
    finally:
        ray.shutdown()


def cmd_status(args) -> int:
    """Inspect a (possibly running / partial) run directory — the
    minimal job-status surface (S11 analog of the reference's
    web/api/routes.py task-status endpoints, without the web chrome).
    Reads only the manifest; no Ray session needed."""
    import os

    mpath = os.path.join(args.run_dir, "manifest.json")
    if not os.path.isfile(mpath):
        print(json.dumps({"ok": False, "detail": "no manifest.json"}))
        return 2
    with open(mpath, encoding="utf-8") as f:
        data = json.load(f)
    done = data.get("done", {})
    num_parts = data.get("num_parts", 0)
    degraded = sorted(int(k) for k, v in done.items() if v.get("profile"))
    print(
        json.dumps(
            {
                "ok": True,
                "num_parts": num_parts,
                "done": len(done),
                "pending": [p for p in range(num_parts) if str(p) not in done],
                "progress": len(done) / max(1, num_parts),
                "rows": sum(v.get("rows", 0) for v in done.values()),
                "seconds": round(sum(v.get("seconds", 0.0) for v in done.values()), 3),
                "degraded_partitions": degraded,
                "input_fp": data.get("input_fp"),
                "config_fp": data.get("config_fp"),
            }
        )
    )
    return 0


def cmd_validate(args) -> int:
    from .state.manifest import validate_transcripts

    ok, msg = validate_transcripts(args.input)
    print(json.dumps({"ok": ok, "detail": msg}))
    return 0 if ok else 2


def cmd_export(args) -> int:
    from .pipelines.export import export_md, export_txt
    from .pipelines.resumable import read_output

    ray = _ray_init(args.num_cpus)
    try:
        ds = read_output(args.run_dir)
        (export_md if args.format == "md" else export_txt)(ds, args.out)
        print(json.dumps({"format": args.format, "out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_submit(args) -> int:
    """Enqueue a run without executing it (the upload endpoint analog,
    web/api/routes.py:27-108): validate input, admission-cap the queue,
    drop an atomic job spec, print the job id for `watch`."""
    from .state.jobqueue import QueueFullError, submit_job
    from .state.manifest import validate_transcripts

    ok, msg = validate_transcripts(args.input)
    if not ok:
        print(json.dumps({"ok": False, "detail": f"invalid input: {msg}"}))
        return 2
    spec = {"input": args.input, "out": args.out}
    if args.num_parts is not None:
        spec["num_parts"] = args.num_parts  # else drain sizes from the input
    try:
        job_id = submit_job(args.queue, spec, queue_cap=args.queue_cap)
    except QueueFullError as e:
        print(json.dumps({"ok": False, "detail": str(e)}))
        return 3
    print(json.dumps({"ok": True, "job_id": job_id, "state": "queued"}))
    return 0


def cmd_drain(args) -> int:
    """Worker loop: claim queued jobs (atomic rename = the mutex; any
    number of drain workers may share one queue dir) and run each to
    completion — the background-processing half of the reference's web
    surface (web/api/tasks.py:285-353), with `ray job submit`-style
    execution instead of an in-process thread pool."""
    from .config import DEFAULT_CONFIG
    from .pipelines.resumable import audit_completeness, run_resumable, suggest_layout
    from .state.jobqueue import claim_next_job, finish_job, requeue_running

    if args.reclaim:
        # jobs stranded in running/ by a dead worker go back to queued/
        # (runs are resumable — a reclaim re-runs only pending partitions)
        for job_id in requeue_running(args.queue):
            print(json.dumps({"event": "job_reclaimed", "job_id": job_id}), flush=True)
    ray = _ray_init(args.num_cpus)
    n_run = 0
    try:
        while args.max_jobs is None or n_run < args.max_jobs:
            claimed = claim_next_job(args.queue)
            if claimed is None:
                break
            job_id, spec = claimed
            try:
                num_parts = spec.get("num_parts")
                read_blocks = None
                if num_parts is None:
                    # same data-proportional sizing as `run` (a fixed
                    # default reproduces the chunky-task superlinearity
                    # suggest_layout exists to prevent)
                    num_parts, read_blocks = suggest_layout(spec["input"])
                manifest = run_resumable(
                    spec["input"], spec["out"], DEFAULT_CONFIG,
                    num_parts=int(num_parts),
                    read_num_blocks=read_blocks,
                )
                complete, n_in, n_out = audit_completeness(spec["input"], manifest)
                finish_job(
                    args.queue, job_id, complete,
                    {"complete": complete, "rows_in": n_in, "rows_out": n_out},
                )
            except Exception as e:  # noqa: BLE001 — job failure is a queue state
                try:
                    finish_job(args.queue, job_id, False, {"error": repr(e)[:500]})
                except Exception:  # noqa: BLE001 — never kill the worker loop
                    print(json.dumps({"event": "finish_failed", "job_id": job_id}),
                          file=sys.stderr, flush=True)
            n_run += 1
            print(json.dumps({"event": "job_finished", "job_id": job_id}), flush=True)
    finally:
        ray.shutdown()
    print(json.dumps({"jobs_run": n_run}))
    return 0


def cmd_watch(args) -> int:
    """Poll a submitted job until it leaves the queue (the status
    endpoint analog, web/api/routes.py:111-140). Manifest-only — no Ray
    session."""
    import time as _time

    from .state.jobqueue import job_status

    deadline = _time.time() + args.timeout
    while True:
        st = job_status(args.queue, args.job)
        print(json.dumps(st), flush=True)
        if st["state"] in ("done", "failed", "unknown"):
            return {"done": 0, "failed": 1, "unknown": 2}[st["state"]]
        if _time.time() >= deadline:
            print(json.dumps({"ok": False, "detail": "watch timeout"}))
            return 4
        _time.sleep(args.interval)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="intelligent_ocr_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="resumable extraction run (re-run to resume)")
    r.add_argument("--input", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--num-parts", type=int, default=None,
                   help="output partitions; default sizes from the input "
                        "(~62.5k rows per partition, suggest_layout)")
    r.add_argument("--progress", action="store_true", help="print per-partition progress/ETA lines")
    r.add_argument("--partition-timeout", type=float, default=None,
                   help="progress watchdog: seconds without ANY progress signal (a "
                        "partition commit, a completed map batch, or a partition task "
                        "starting) before the attempt is abandoned — size it to the "
                        "longest single unit of work, not the whole phase")
    r.add_argument("--degraded-rerun", action="store_true",
                   help="rerun failed/hung partitions under the degraded profile ladder")
    r.add_argument("--fuse", action=argparse.BooleanOptionalAction, default=True,
                   help="fused partitioned layout (one narrow shuffle, "
                        "sort+extract+write per partition — the cluster-scale "
                        "path and the bench headline); --no-fuse runs the "
                        "staged extract + wide shuffle form")
    r.add_argument("--salt-turns", type=int, default=None,
                   help="skew escape hatch: split mega-conversations into "
                        "turn_idx // N sub-keys for partitioning (output stays "
                        "sorted within each partition; whole-conversation "
                        "contiguity needs a merge at read time)")
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("status", help="inspect a run directory's manifest")
    s.add_argument("--run-dir", required=True)
    s.set_defaults(fn=cmd_status)

    v = sub.add_parser("validate", help="check an input directory")
    v.add_argument("--input", required=True)
    v.set_defaults(fn=cmd_validate)

    e = sub.add_parser("export", help="per-conversation TXT/MD export of a run")
    e.add_argument("--run-dir", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--format", choices=["txt", "md"], default="txt")
    e.set_defaults(fn=cmd_export)

    sb = sub.add_parser("submit", help="enqueue a run into a queue directory")
    sb.add_argument("--queue", required=True)
    sb.add_argument("--input", required=True)
    sb.add_argument("--out", required=True)
    sb.add_argument("--num-parts", type=int, default=None,
                    help="output partitions; default lets the drain worker "
                         "size from the input (suggest_layout)")
    sb.add_argument("--queue-cap", type=int, default=10,
                    help="admission cap: reject submits past this many queued jobs")
    sb.set_defaults(fn=cmd_submit)

    d = sub.add_parser("drain", help="claim and run queued jobs (worker loop)")
    d.add_argument("--queue", required=True)
    d.add_argument("--max-jobs", type=int, default=None)
    d.add_argument("--reclaim", action="store_true",
                   help="first requeue jobs stranded in running/ by a dead "
                        "worker (only when no live worker owns the queue)")
    d.set_defaults(fn=cmd_drain)

    w = sub.add_parser("watch", help="poll a submitted job until done/failed")
    w.add_argument("--queue", required=True)
    w.add_argument("--job", required=True)
    w.add_argument("--interval", type=float, default=2.0)
    w.add_argument("--timeout", type=float, default=3600.0)
    w.set_defaults(fn=cmd_watch)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
