"""CLI surface: run --progress emits per-partition ETA lines; status
inspects a manifest without a Ray session (S11/A4 analogs)."""

import json
import os
import subprocess
import sys

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
