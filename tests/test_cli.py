"""CLI surface: run --progress emits per-partition ETA lines; status
inspects a manifest without a Ray session (S11/A4 analogs)."""

import json
import os
import subprocess
import sys

import pytest

import pyarrow.parquet as pq

from intelligent_ocr_ray.sources.transcripts import generate_transcripts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_run_progress_and_status(tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    pq.write_table(generate_transcripts(12, seed=4), os.path.join(src, "d.parquet"))
    out = str(tmp_path / "out")
    # subprocess: the CLI owns its own Ray session (the test fixture's
    # session must not be shut down by cmd_run's finally block)
    env = dict(os.environ, PYTHONPATH=REPO, RAY_DISABLE_IMPORT_WARNING="1")
    proc = subprocess.run(
        [sys.executable, "-m", "intelligent_ocr_ray", "--num-cpus", "2",
         "run", "--input", src, "--out", out, "--num-parts", "4", "--progress"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    prog = [l for l in lines if l.get("event") == "partition_done"]
    assert len(prog) >= 1
    assert prog[-1]["done"] == prog[-1]["total"] == 4
    assert "eta_s" in prog[-1] and prog[-1]["rows"] > 0
    final = lines[-1]
    assert final["complete"] is True

    # status: manifest-only, no Ray
    from intelligent_ocr_ray.__main__ import main

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["status", "--run-dir", out])
    assert rc == 0
    st = json.loads(buf.getvalue())
    assert st["done"] == 4 and st["pending"] == [] and st["progress"] == 1.0
    assert st["rows"] > 0 and st["degraded_partitions"] == []


def test_submit_drain_watch_roundtrip(tmp_path):
    """S11 enqueue surface: submit (atomic spec + admission cap) →
    drain worker (claim by rename, run, finish) → watch (poll to done).
    Mirrors upload → background processing → status of the reference's
    web surface (web/api/routes.py:27-140) over a queue directory."""
    from intelligent_ocr_ray.__main__ import main as cli_main
    from intelligent_ocr_ray.state.jobqueue import (
        QueueFullError,
        claim_next_job,
        job_status,
        list_jobs,
        submit_job,
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    pq.write_table(generate_transcripts(10, seed=6), os.path.join(src, "d.parquet"))
    q = str(tmp_path / "queue")
    out = str(tmp_path / "out")

    import io
    from contextlib import redirect_stdout

    def run_cli(argv):
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = cli_main(argv)
        lines = [json.loads(l) for l in buf.getvalue().splitlines() if l.startswith("{")]
        return rc, lines

    # submit validates input
    rc, lines = run_cli(["submit", "--queue", q, "--input", str(tmp_path / "nope"),
                         "--out", out])
    assert rc == 2 and lines[-1]["ok"] is False

    rc, lines = run_cli(["submit", "--queue", q, "--input", src, "--out", out,
                         "--num-parts", "4"])
    assert rc == 0
    job_id = lines[-1]["job_id"]
    assert job_status(q, job_id)["state"] == "queued"

    # admission cap (reference caps queued uploads at 10)
    with pytest.raises(QueueFullError):
        for _ in range(12):
            submit_job(q, {"input": src, "out": out}, queue_cap=3)
    assert len(list_jobs(q, "queued")) == 3

    # drain in a subprocess (the worker owns its own Ray session);
    # cap at 1 job so the duplicate fillers stay queued
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "intelligent_ocr_ray", "--num-cpus", "2",
         "drain", "--queue", q, "--max-jobs", "1"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert json.loads(proc.stdout.strip().splitlines()[-1])["jobs_run"] == 1

    # watch: job is done, first poll returns
    rc, lines = run_cli(["watch", "--queue", q, "--job", job_id, "--timeout", "5"])
    assert rc == 0
    st = lines[-1]
    assert st["state"] == "done" and st["complete"] is True and st["progress"] == 1.0

    # claim order is FIFO over the remaining fillers
    first_filler = list_jobs(q, "queued")[0]
    jid, _ = claim_next_job(q)
    assert jid == first_filler


def test_jobqueue_reclaim_and_idempotent_finish(tmp_path):
    """Worker-death recovery (no Ray needed): a claimed-but-unfinished
    job is requeued by reclaim and claimable again; finish_job is
    idempotent — a second finish (crash-retry path) is a no-op and a
    job never occupies two terminal states."""
    from intelligent_ocr_ray.state.jobqueue import (
        claim_next_job,
        finish_job,
        job_status,
        list_jobs,
        requeue_running,
        submit_job,
    )

    q = str(tmp_path / "q")
    jid = submit_job(q, {"input": "i", "out": "o"})
    got, _ = claim_next_job(q)
    assert got == jid and job_status(q, jid)["state"] == "running"
    # dead worker: reclaim moves it back; it is claimable again
    assert requeue_running(q) == [jid]
    assert job_status(q, jid)["state"] == "queued"
    got2, _ = claim_next_job(q)
    assert got2 == jid
    finish_job(q, jid, True, {"complete": True})
    assert job_status(q, jid)["state"] == "done"
    # crash-retry double finish: no-op, no second terminal copy
    finish_job(q, jid, False, {"error": "late duplicate"})
    assert job_status(q, jid)["state"] == "done"
    assert list_jobs(q, "failed") == [] and list_jobs(q, "running") == []


def test_jobqueue_finish_crash_windows_never_lose_the_job(tmp_path):
    """ADVICE r3: finish_job publishes the terminal copy FIRST and
    retires running/ LAST, so every crash window leaves the job in at
    least one state dir. Simulated crash after publish-before-unlink:
    the job shows done AND running; requeue resolves terminal-wins
    (retires the stale running copy, does NOT requeue); a late finish
    retry also resolves it without overwriting the first result."""
    import json
    import os

    from intelligent_ocr_ray.state.jobqueue import (
        claim_next_job,
        finish_job,
        job_status,
        list_jobs,
        requeue_running,
        submit_job,
    )

    q = str(tmp_path / "q")
    jid = submit_job(q, {"input": "i", "out": "o"})
    claim_next_job(q)
    # crash window: terminal copy published, running copy not yet gone
    run_path = os.path.join(q, "running", f"{jid}.json")
    with open(run_path, encoding="utf-8") as f:
        body = json.load(f)
    with open(os.path.join(q, "done", f"{jid}.json"), "w", encoding="utf-8") as f:
        json.dump(dict(body, complete=True, rows_out=7), f)
    # orphaned finish tmp from the same crash
    with open(os.path.join(q, f"_tmp-fin-{jid}.json"), "w", encoding="utf-8") as f:
        json.dump(body, f)
    assert list_jobs(q, "running") == [jid] and list_jobs(q, "done") == [jid]
    # a finish retry resolves terminal-wins and keeps the first result
    finish_job(q, jid, False, {"error": "retry after crash"})
    assert list_jobs(q, "running") == [] and list_jobs(q, "failed") == []
    st = job_status(q, jid)
    assert st["state"] == "done" and st["rows_out"] == 7

    # same window, resolved by requeue instead: retire, don't requeue
    jid2 = submit_job(q, {"input": "i2", "out": "o2"})
    claim_next_job(q)
    with open(os.path.join(q, "running", f"{jid2}.json"), encoding="utf-8") as f:
        body2 = json.load(f)
    with open(os.path.join(q, "failed", f"{jid2}.json"), "w", encoding="utf-8") as f:
        json.dump(dict(body2, error="boom"), f)
    assert requeue_running(q) == []
    assert list_jobs(q, "queued") == [] and list_jobs(q, "running") == []
    assert job_status(q, jid2)["state"] == "failed"
    # the orphan tmp file was swept by requeue (no-live-worker path)
    assert not [f for f in os.listdir(q) if f.startswith("_tmp-")]


def test_jobqueue_dual_terminal_resolves_done_wins_and_enqueue_tmp_survives(tmp_path):
    """Two finishers racing through the terminal-exists check can
    publish done/ AND failed/ copies of one job; the reconcile rule is
    deterministic (done wins — a success is never invalidated by a
    stale claimant's failure report) and runs both at finish time and
    in the requeue sweep. The sweep must also leave ENQUEUE tmp files
    (_tmp-{id}.json, owned by a live driver mid-submit) alone while
    sweeping finish tmps."""
    import json
    import os

    from intelligent_ocr_ray.state.jobqueue import (
        claim_next_job,
        finish_job,
        job_status,
        list_jobs,
        requeue_running,
        submit_job,
    )

    q = str(tmp_path / "q")
    jid = submit_job(q, {"input": "i", "out": "o"})
    claim_next_job(q)
    # SEQUENTIAL duplicate finishes resolve first-wins (idempotence):
    # a finisher that sees an existing terminal copy only retires the
    # running copy, never publishes a second state
    with open(os.path.join(q, "running", f"{jid}.json"), encoding="utf-8") as f:
        body = json.load(f)
    with open(os.path.join(q, "failed", f"{jid}.json"), "w", encoding="utf-8") as f:
        json.dump(dict(body, error="first finish"), f)
    finish_job(q, jid, True, {"complete": True, "rows_out": 3})
    assert list_jobs(q, "failed") == [jid] and list_jobs(q, "done") == []
    assert job_status(q, jid)["state"] == "failed"

    # crashed-in-window variant: both terminal copies on disk, no
    # finisher alive — the requeue sweep repairs it the same way
    jid2 = submit_job(q, {"input": "i2", "out": "o2"})
    claim_next_job(q)
    finish_job(q, jid2, True, {"complete": True})
    with open(os.path.join(q, "failed", f"{jid2}.json"), "w", encoding="utf-8") as f:
        json.dump({"job_id": jid2, "error": "crashed loser"}, f)
    # enqueue tmp of a concurrent mid-submit driver + an orphaned finish tmp
    enq_tmp = os.path.join(q, "_tmp-99999999999999999999-00001.json")
    fin_tmp = os.path.join(q, f"_tmp-fin-{jid2}.json")
    for p in (enq_tmp, fin_tmp):
        with open(p, "w", encoding="utf-8") as f:
            f.write("{}")
    requeue_running(q)
    assert list_jobs(q, "done") == [jid2]
    assert list_jobs(q, "failed") == [jid]  # jid's first-wins result stands
    assert os.path.exists(enq_tmp)      # live driver's submit survives
    assert not os.path.exists(fin_tmp)  # finish tmp swept
