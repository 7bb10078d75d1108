"""File-backed job queue — the CLI-native analog of the reference's web
upload/enqueue surface (web/api/routes.py:27-108: upload → task store
with a queue cap → poll status → download; state machine
web/api/tasks.py:17-52 PENDING→PROCESSING→COMPLETED/FAILED).

This engine's driver story is ``ray job submit``, so the enqueue
surface is a QUEUE DIRECTORY on shared storage instead of HTTP:

* ``submit_job`` validates the input, enforces the queue cap (the
  reference caps at 10 queued uploads) and atomically drops a job spec
  into ``queued/`` (tmp + os.replace, the manifest's write discipline);
* a drain worker claims work by atomic rename ``queued/ → running/`` —
  the rename IS the mutex, so any number of workers on shared storage
  can drain the same queue without locks (first rename wins, losers
  skip);
* completion renames into ``done/`` or ``failed/`` with the result
  merged into the spec; ``job_status`` additionally surfaces live
  manifest progress for running jobs (the status-endpoint analog).

Job ids are zero-padded nanosecond timestamps + pid, so lexicographic
order ≈ submit order (FIFO claim, like the reference's serial task
queue, core/task_manager.py:262-311).
"""

from __future__ import annotations

import json
import os
import time

STATES = ("queued", "running", "done", "failed")

# same admission cap as the reference's web task store
DEFAULT_QUEUE_CAP = 10


class QueueFullError(RuntimeError):
    pass


def _state_dir(queue_dir: str, state: str) -> str:
    return os.path.join(queue_dir, state)


def ensure_queue(queue_dir: str) -> None:
    for s in STATES:
        os.makedirs(_state_dir(queue_dir, s), exist_ok=True)


def list_jobs(queue_dir: str, state: str) -> list[str]:
    d = _state_dir(queue_dir, state)
    if not os.path.isdir(d):
        return []
    return sorted(f[:-5] for f in os.listdir(d) if f.endswith(".json"))


def submit_job(
    queue_dir: str, spec: dict, *, queue_cap: int = DEFAULT_QUEUE_CAP
) -> str:
    """Enqueue a run spec ({'input': ..., 'out': ..., 'num_parts': ...}).
    Rejects when the queue holds >= queue_cap jobs (admission control,
    web/api/tasks.py:66-70 analog). Returns the job id."""
    ensure_queue(queue_dir)
    if len(list_jobs(queue_dir, "queued")) >= queue_cap:
        raise QueueFullError(
            f"queue {queue_dir} is full ({queue_cap} jobs queued)"
        )
    job_id = f"{time.time_ns():020d}-{os.getpid():05d}"
    body = dict(spec, job_id=job_id, submitted_at=time.time())
    tmp = os.path.join(queue_dir, f"_tmp-{job_id}.json")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(body, f)
    os.replace(tmp, os.path.join(_state_dir(queue_dir, "queued"), f"{job_id}.json"))
    return job_id


def claim_next_job(queue_dir: str) -> tuple[str, dict] | None:
    """FIFO-claim the oldest queued job by atomic rename into running/.
    Concurrent workers race on the rename; exactly one wins per job.
    Returns (job_id, spec) or None when the queue is empty."""
    ensure_queue(queue_dir)
    for job_id in list_jobs(queue_dir, "queued"):
        src = os.path.join(_state_dir(queue_dir, "queued"), f"{job_id}.json")
        dst = os.path.join(_state_dir(queue_dir, "running"), f"{job_id}.json")
        try:
            os.rename(src, dst)
        except OSError:
            continue  # another worker won this job
        with open(dst, encoding="utf-8") as f:
            return job_id, json.load(f)
    return None


def _terminal_path(queue_dir: str, job_id: str) -> str | None:
    """Path of the job's done/ or failed/ copy, if one exists
    (done wins when both do — see _reconcile_terminal)."""
    for state in ("done", "failed"):
        p = os.path.join(_state_dir(queue_dir, state), f"{job_id}.json")
        if os.path.isfile(p):
            return p
    return None


def _reconcile_terminal(queue_dir: str, job_id: str) -> None:
    """Collapse the dual-terminal window: two RACING finishers (one of
    them necessarily operating on a reclaimed claim) can both pass the
    terminal-exists check and publish done/ AND failed/ copies. The
    deterministic winner is done/ — a success result is never
    invalidated by a concurrent failure report from a stale claimant —
    so the failed/ twin is retired. Idempotent and crash-safe: every
    finisher runs it after publishing, and requeue_running repeats it
    for jobs whose finisher crashed in the window."""
    done_p = os.path.join(_state_dir(queue_dir, "done"), f"{job_id}.json")
    failed_p = os.path.join(_state_dir(queue_dir, "failed"), f"{job_id}.json")
    if os.path.isfile(done_p) and os.path.isfile(failed_p):
        try:
            os.unlink(failed_p)
        except FileNotFoundError:
            pass


def finish_job(queue_dir: str, job_id: str, ok: bool, result: dict) -> None:
    """running/ → done/ (or failed/) with the result merged in.

    Publish order is terminal-copy FIRST, running-unlink LAST: a crash
    between the two steps then leaves the job visible in BOTH states
    for a moment, which is safe because every reader resolves the race
    terminal-wins (``requeue_running`` retires — never requeues — a
    running copy that has a terminal twin; ``job_status`` scans
    done/failed before running would matter for display only). The
    previous unlink-first order could LOSE the job outright: a crash
    after the unlink left it in no state dir at all, invisible to
    requeue (ADVICE r3). Idempotent: if a terminal copy already exists,
    this call only retires the stale running copy; two finishers racing
    through the exists-check resolve deterministically via
    _reconcile_terminal (done wins)."""
    src = os.path.join(_state_dir(queue_dir, "running"), f"{job_id}.json")
    if _terminal_path(queue_dir, job_id) is not None:
        try:
            os.unlink(src)  # retire a stale running copy, keep the result
        except FileNotFoundError:
            pass
        return
    if not os.path.isfile(src):
        return  # never claimed — nothing to move
    with open(src, encoding="utf-8") as f:
        body = json.load(f)
    body.update(result, finished_at=time.time())
    tmp = os.path.join(queue_dir, f"_tmp-fin-{job_id}.json")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(body, f)
    dst_state = "done" if ok else "failed"
    os.replace(tmp, os.path.join(_state_dir(queue_dir, dst_state), f"{job_id}.json"))
    _reconcile_terminal(queue_dir, job_id)  # racing finishers: done wins
    try:
        os.unlink(src)
    except FileNotFoundError:
        pass  # racing finisher already retired it — terminal copy stands


def requeue_running(queue_dir: str) -> list[str]:
    """Move every running/ job back to queued/ — the reclaim path for
    jobs stranded by a worker that died mid-run (the reference's task
    store ages out stuck PROCESSING tasks the same way). Safe because
    runs are resumable: a reclaimed job re-runs only its pending
    partitions. Terminal-wins: a running copy whose job already has a
    done/failed twin (finish_job crashed between publish and unlink) is
    retired, not requeued. Only call when no live worker owns the
    queue; orphaned finish tmp files are swept here under the same
    no-live-worker precondition."""
    ensure_queue(queue_dir)
    moved = []
    # repair finishers that crashed inside the dual-terminal window
    for job_id in list_jobs(queue_dir, "failed"):
        _reconcile_terminal(queue_dir, job_id)
    for job_id in list_jobs(queue_dir, "running"):
        src = os.path.join(_state_dir(queue_dir, "running"), f"{job_id}.json")
        if _terminal_path(queue_dir, job_id) is not None:
            try:
                os.unlink(src)
            except FileNotFoundError:
                pass
            continue
        dst = os.path.join(_state_dir(queue_dir, "queued"), f"{job_id}.json")
        try:
            os.rename(src, dst)
            moved.append(job_id)
        except OSError:
            continue
    # sweep only FINISH-path tmp files: enqueue tmps (_tmp-{id}.json)
    # belong to live drivers, which the no-live-WORKER precondition
    # says nothing about — sweeping one would lose a job mid-submit
    for name in os.listdir(queue_dir):
        if name.startswith("_tmp-fin-") and name.endswith(".json"):
            try:
                os.unlink(os.path.join(queue_dir, name))
            except FileNotFoundError:
                pass
    return moved


def job_status(queue_dir: str, job_id: str) -> dict:
    """Where is this job, plus live manifest progress when it has an
    output directory (the GET /api/status/{id} analog)."""
    for state in STATES:
        path = os.path.join(_state_dir(queue_dir, state), f"{job_id}.json")
        if os.path.isfile(path):
            with open(path, encoding="utf-8") as f:
                body = json.load(f)
            out: dict = {"job_id": job_id, "state": state}
            for k in ("input", "out", "num_parts", "submitted_at", "finished_at",
                      "complete", "rows_out", "error"):
                if k in body:
                    out[k] = body[k]
            mpath = os.path.join(body.get("out", ""), "manifest.json")
            if state in ("running", "done") and os.path.isfile(mpath):
                with open(mpath, encoding="utf-8") as f:
                    man = json.load(f)
                done = man.get("done", {})
                nparts = man.get("num_parts", 0)
                out["progress"] = len(done) / max(1, nparts)
                out["rows"] = sum(v.get("rows", 0) for v in done.values())
            return out
    return {"job_id": job_id, "state": "unknown"}
