"""R4 partition watchdog + task-level degraded rerun — the engine
analogs of the reference's per-task daemon-thread timeout
(core/task_manager.py:288,313-332) and degraded-profile task rerun
(desktop/workers.py:357-389), plus the in-run progress/ETA surface
(core/parallel_ocr.py:492-504)."""

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from intelligent_ocr_ray.config import ExtractorConfig
from intelligent_ocr_ray.pipelines.extract import extract_dataset
from intelligent_ocr_ray.pipelines.resumable import (
    audit_completeness,
    read_output,
    run_resumable,
)
from intelligent_ocr_ray.sources.transcripts import generate_transcripts

CFG = ExtractorConfig(retry_limit=0)
MARKER = "POISONPART marker payload that breaks the strict profile xxxx yyyy zzzz"


def _write_input(tmp_path, with_marker=True):
    t = generate_transcripts(24, seed=21)
    if with_marker:
        extra = pa.table(
            {
                "conv_id": pa.array(["conv000003"] * 2, pa.string()),
                "turn_idx": pa.array([900, 901], pa.int32()),
                "role": pa.array(["user", "user"], pa.string()),
                "text": pa.array([MARKER, MARKER], pa.string()),
                "tool": pa.array(["", ""], pa.string()),
                "ts": pa.array([None, None], pa.timestamp("us")),
            }
        )
        t = pa.concat_tables([t.cast(extra.schema), extra])
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    pq.write_table(t, os.path.join(src, "data.parquet"))
    return src


def _boom_extract(ds, cfg, *, batch_size=4096, concurrency=None):
    """Extraction stage that fails WHOLE TASKS (not rows) for marker
    payloads under the strict profile — the partition-level failure mode
    the per-row ladder can't absorb. The degraded ladder's profiles set
    lenient_layout=True, which this stage tolerates."""

    def maybe_boom(t: pa.Table) -> pa.Table:
        if not cfg.lenient_layout:
            hit = pc.any(
                pc.match_substring(t.column("text"), "POISONPART").fill_null(False)
            ).as_py()
            if hit:
                raise ValueError("strict profile cannot process this partition")
        return t

    ds = ds.map_batches(maybe_boom, batch_format="pyarrow", zero_copy_batch=True)
    return extract_dataset(ds, cfg, batch_size=batch_size, concurrency=concurrency)


def _sleepy_extract(ds, cfg, *, batch_size=4096, concurrency=None):
    """Hang simulation: the strict profile stalls every task long past
    the watchdog budget; degraded profiles run normally."""

    def maybe_hang(t: pa.Table) -> pa.Table:
        if not cfg.lenient_layout:
            time.sleep(12)
        return t

    ds = ds.map_batches(maybe_hang, batch_format="pyarrow", zero_copy_batch=True)
    return extract_dataset(ds, cfg, batch_size=batch_size, concurrency=concurrency)


def test_poisoned_partition_fails_without_degraded_rerun(tmp_path):
    src = _write_input(tmp_path)
    with pytest.raises(RuntimeError, match="failed every profile"):
        run_resumable(
            src, str(tmp_path / "out"), CFG, num_parts=8,
            concurrency=2, extract_fn=_boom_extract,
        )


def test_degraded_rerun_recovers_poisoned_partitions(tmp_path):
    src = _write_input(tmp_path)
    out = str(tmp_path / "out")
    man = run_resumable(
        src, out, CFG, num_parts=8, concurrency=2,
        extract_fn=_boom_extract, degraded_rerun=True,
    )
    assert man.is_complete()
    ok, rin, rout = audit_completeness(src, man)
    assert ok, (rin, rout)
    # the strict attempt died at the map stage (shuffle barrier → no
    # commits), so every partition records the degraded rung's profile
    profiles = {v.get("profile") for v in man.done.values()}
    assert all(p and p.startswith("degraded[0]") for p in profiles)
    # the marker rows made it to the output (fallback-copy semantics)
    t = read_output(out)
    n = t.filter(expr="conv_id == 'conv000003'").count()
    assert n > 0


def test_partial_degraded_rerun_only_touches_pending(tmp_path):
    """Lineage distinguishes partitions committed by the healthy first
    run from partitions recovered under a degraded rung on resume."""
    src = _write_input(tmp_path)
    out = str(tmp_path / "out")
    # healthy full run (the marker only breaks _boom_extract)
    man = run_resumable(src, out, CFG, num_parts=8, concurrency=2)
    assert man.is_complete()
    # simulate two partitions lost mid-run: uncommit them
    mpath = os.path.join(out, "manifest.json")
    data = json.load(open(mpath))
    marker_part = None
    for d in sorted(os.listdir(out)):
        if d.startswith("part="):
            t = pq.read_table(os.path.join(out, d), columns=["conv_id"])
            if "conv000003" in set(t.column("conv_id").to_pylist()):
                marker_part = int(d.split("=")[1])
    assert marker_part is not None
    victims = {marker_part, (marker_part + 1) % 8}
    for p in victims:
        data["done"].pop(str(p))
        import shutil

        shutil.rmtree(os.path.join(out, f"part={p:04d}"))
    json.dump(data, open(mpath, "w"))
    # resume with the strict-failing stage: attempt 1 fails on the
    # marker partition, the degraded rung completes ONLY the pending two
    man2 = run_resumable(
        src, out, CFG, num_parts=8, concurrency=2,
        extract_fn=_boom_extract, degraded_rerun=True,
    )
    assert man2.is_complete()
    ok, _, _ = audit_completeness(src, man2)
    assert ok
    for p, v in man2.done.items():
        if p in victims:
            assert v.get("profile", "").startswith("degraded[0]"), (p, v)
        else:
            assert "profile" not in v, (p, v)


def test_watchdog_times_out_hung_attempt(tmp_path):
    src = _write_input(tmp_path, with_marker=False)
    out = str(tmp_path / "out")
    t0 = time.perf_counter()
    man = run_resumable(
        src, out, CFG, num_parts=4, concurrency=2,
        extract_fn=_sleepy_extract, degraded_rerun=True,
        partition_timeout_s=4.0,
    )
    wall = time.perf_counter() - t0
    assert man.is_complete()
    ok, _, _ = audit_completeness(src, man)
    assert ok
    # every partition was recovered by a rung, not the hung strict pass
    assert all(v.get("profile") for v in man.done.values())
    assert wall < 90, wall
    # drain the abandoned strict attempt's sleeping tasks before the
    # session fixture tears Ray down (a hard shutdown mid-task aborts
    # the worker pool and with it the pytest process)
    import ray

    for _ in range(40):
        if ray.available_resources().get("CPU", 0) >= ray.cluster_resources().get("CPU", 0):
            break
        time.sleep(1)


def test_progress_callback_reports_eta(tmp_path):
    src = _write_input(tmp_path, with_marker=False)
    events = []
    man = run_resumable(
        src, str(tmp_path / "out"), CFG, num_parts=4, concurrency=2,
        progress_callback=events.append,
    )
    assert man.is_complete()
    assert len(events) >= 1
    dones = [e["done"] for e in events]
    assert dones == sorted(dones)
    last = events[-1]
    assert last["total"] == 4 and last["rows"] > 0
    assert last["elapsed_s"] > 0 and "eta_s" in last


def _slow_but_alive_extract(ds, cfg, *, batch_size=4096, concurrency=None):
    """Every batch takes ~1.5 s — the WHOLE phase far exceeds the 4 s
    budget, but each unit of work completes well inside it (the
    slow-first-shuffle shape the round-2 verdict asked about)."""

    def crawl(t: pa.Table) -> pa.Table:
        time.sleep(1.5)
        return t

    ds = ds.map_batches(crawl, batch_format="pyarrow", zero_copy_batch=True)
    return extract_dataset(ds, cfg, batch_size=batch_size, concurrency=concurrency)


def test_watchdog_heartbeat_tolerates_slow_healthy_phase(tmp_path):
    """Per-unit progress budget: a phase that takes >> partition_timeout_s
    in total but keeps completing batches must NOT be declared hung —
    the heartbeat pings reset the clock (round-2 verdict item #7)."""
    src = _write_input(tmp_path, with_marker=False)
    out = str(tmp_path / "out")
    man = run_resumable(
        src, out, CFG, num_parts=8, concurrency=2,
        extract_fn=_slow_but_alive_extract,
        partition_timeout_s=4.0,
    )
    assert man.is_complete()
    ok, _, _ = audit_completeness(src, man)
    assert ok
    # nothing degraded: the healthy strict pass finished every partition
    assert all("profile" not in v for v in man.done.values())


def test_salted_degraded_rerun_composes(tmp_path):
    """Skew salting and the degraded-rerun ladder compose: a SALTED run
    (custom extract_fn → staged path; the fused+salted pairing is
    covered in test_manifest_resume) whose strict profile poisons on a
    marker payload is recovered by the degraded ladder, with a clean
    completeness audit under the salted partition keys."""
    src = _write_input(tmp_path)  # includes the POISONPART marker rows
    out = str(tmp_path / "out")
    man = run_resumable(
        src, out, CFG, num_parts=8, concurrency=2,
        extract_fn=_boom_extract, degraded_rerun=True,
        salt_turns=16, fuse_extract=False,
    )
    assert man.is_complete()
    ok, rin, rout = audit_completeness(src, man)
    assert ok and rin == rout
    # degraded lineage present (strict pass died at the map stage)
    assert all(v.get("profile", "").startswith("degraded[0]") for v in man.done.values())
    # the marker conversation's rows survived via fallback copy
    t = read_output(out)
    assert t.filter(expr="conv_id == 'conv000003'").count() > 0


def test_cancel_executor_branch_matrix(caplog):
    """_cancel_executor (VERDICT r3 #9): present → shutdown(force=True)
    issued; absent → logged no-op; raising → logged, advisory. Plus a
    canary pinning that THIS Ray version still defines the private
    attr the fast path relies on — an upgrade that moves it fails here
    loudly instead of silently degrading every watchdog fire."""
    import logging

    import ray.data as rdata

    from intelligent_ocr_ray.pipelines.resumable import _cancel_executor

    # canary: the private attr still exists on this Ray version
    import inspect

    assert "_current_executor" in inspect.getsource(rdata.Dataset.__init__)

    calls = []

    class GoodExec:
        def shutdown(self, force=False):
            calls.append(force)

    class DS:
        pass

    ds = DS()
    ds._current_executor = GoodExec()
    assert _cancel_executor(ds) is True and calls == [True]

    with caplog.at_level(logging.WARNING, logger="intelligent_ocr_ray.pipelines.resumable"):
        assert _cancel_executor(object()) is False
    assert any("_current_executor unavailable" in r.message for r in caplog.records)

    class BadExec:
        def shutdown(self, force=False):
            raise RuntimeError("already torn down")

    caplog.clear()
    ds2 = DS()
    ds2._current_executor = BadExec()
    with caplog.at_level(logging.WARNING, logger="intelligent_ocr_ray.pipelines.resumable"):
        assert _cancel_executor(ds2) is False
    assert any("shutdown failed" in r.message for r in caplog.records)
