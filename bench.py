"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N, ...}

Headline = flagship per-turn extraction (turns/sec) over a
deterministically generated transcripts table sized to the sf dir
(cached under /tmp, generation excluded from timing). The headline
pipeline is the FUSED PARTITIONED layout (run_resumable
fuse_extract=True: one narrow-input hash shuffle → per-partition
sort+extract+write, zstd, manifest commits) — the cluster-scale path;
the global-sort ordered flagship is timed separately as
`flagship_global_sort`.

--scaling: runs the plain bench twice in FRESH processes at
RAY_GRAFT_CPUS=8 and =32 on the same input and reports both
throughputs + efficiency = (thr_32/thr_8)/4 — the sandbox evidence for
the north rule's two-cluster-size criterion (no real cluster here).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# transcripts sized from the sf documents table: deterministic, cached.
# 60 convs/doc ≈ 4M turns at sf0.1. GRAFT_CONVS_PER_DOC scales the
# corpus for scaling-evidence runs: fixed pipeline overheads (sort
# barrier, scheduling) amortize with corpus size, as they would on a
# real cluster where per-job overhead is negligible against the data.
CONVS_PER_DOC = int(os.environ.get("GRAFT_CONVS_PER_DOC", "60"))

# best-of-N trials for the headline timing. Default 3 absorbs the
# multi-tenant host noise at bench scale; the 64M-turn scaling legs set
# 2 (a 2-CPU leg runs ~12 min — three trials would dominate the
# campaign wall without changing the best-of statistics much).
N_TRIALS = max(1, int(os.environ.get("GRAFT_TRIALS", "3")))


def transcripts_dir() -> str:
    import pyarrow.parquet as pq

    from intelligent_ocr_ray.sources.transcripts import cached_transcripts_dir

    n_docs = pq.read_metadata(os.path.join(SF_DIR, "documents.parquet")).num_rows
    return cached_transcripts_dir(n_convs=n_docs * CONVS_PER_DOC, seed=42)


def cpu_ref_ms() -> float:
    """Fixed single-threaded reference workload (~0.3 s on an idle
    core). The sandbox host is multi-tenant with heavy steal-time noise
    (identical pipeline runs vary up to 2×); this index calibrates every
    timing so cross-run comparisons can spot a bad neighbor window."""
    import numpy as np

    a = np.random.RandomState(0).rand(384, 384)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(60):
            a = a @ a
            a /= np.linalg.norm(a)
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def _par_ref_worker(_):
    # memory-streaming workload (cache-busting): sensitive to the shared
    # memory bus, which the in-cache single-core index cannot see
    import numpy as np

    x = np.random.RandomState(1).rand(4_000_000)
    s = 0.0
    for _ in range(6):
        s += float((x * 1.0001).sum())
        x += 0.5
    return s


def cpu_ref_par_ms() -> float:
    """All-cores calibration twin of cpu_ref_ms: the same box can show a
    FAST single core (in-cache matmul) while 32-way parallel throughput
    is halved by neighbor-VM memory-bus contention — a regime observed
    to inflate every pipeline 2-4x uniformly. Wall time for NUM_CPUS
    concurrent memory-streaming workers; compare across runs, and
    against cpu_ref_ms, to classify a window before trusting timings."""
    from concurrent.futures import ProcessPoolExecutor

    t0 = time.perf_counter()
    with ProcessPoolExecutor(max_workers=NUM_CPUS) as ex:
        list(ex.map(_par_ref_worker, range(NUM_CPUS)))
    return round((time.perf_counter() - t0) * 1000, 1)


def _tmp_headroom_check(n_rows: int) -> None:
    """64M-turn campaigns abort mid-run when /tmp crosses raylet's 95%
    disk threshold (spill dir + bench output copies at ~3.4 GB each) —
    previously a CLAUDE.md footnote, now enforced (VERDICT r4 #8):
    project output + spill bytes from the row count, clean stale
    /tmp/ior_bench_out copies first, and refuse LOUDLY if free space is
    still short — a clean refusal beats a raylet abort 40 minutes in."""
    import shutil

    # measured at 64M turns: output parquet copies ≈3.4 GB per trial
    # leg plus spill ≈ input bytes; ≈120 bytes/turn covers both sides
    projected = int(n_rows * 120) * max(1, N_TRIALS)
    free = shutil.disk_usage("/tmp").free
    if free < projected + (2 << 30):
        shutil.rmtree("/tmp/ior_bench_out", ignore_errors=True)
        free = shutil.disk_usage("/tmp").free
    if free < projected + (2 << 30):
        raise SystemExit(
            f"bench: /tmp has {free / 1e9:.1f} GB free but this corpus "
            f"projects {projected / 1e9:.1f} GB of output+spill; raylet "
            "aborts spill-heavy runs at 95% disk — free /tmp first "
            "(old Ray session dirs, /tmp/ior_bench_out) and rerun"
        )


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    src = transcripts_dir()

    import pyarrow.parquet as pq

    import ray.data as rd

    n_rows = sum(
        pq.read_metadata(os.path.join(src, f)).num_rows
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    _tmp_headroom_check(n_rows)

    # warm-up (untimed): page cache AND the full worker pool — Ray spawns
    # worker processes lazily, and first-touch at 32 CPUs costs ~20 s
    # that has nothing to do with the pipeline under test
    rd.read_parquet(src, columns=["conv_id"]).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    from intelligent_ocr_ray.pipelines.extract import flagship, write_extracted
    from intelligent_ocr_ray.pipelines.resumable import run_resumable

    results: dict[str, float] = {}

    # best-of-2: the sandbox host is multi-tenant (nonzero steal time);
    # a single timing can be 2-4× off on a bad neighbor window
    import shutil

    # Headline: fused partitioned extraction. Layout is DATA-proportional
    # and identical at every CPU level (same job, two cluster sizes):
    # ~250k-row read blocks / ~62.5k-row partitions, floors 64/256 —
    # the pairing that measured best across 2/8/32 CPUs at 4-16M turns
    # (BENCH/BASELINE.md). Scaling blocks with rows (not CPUs) is the
    # 100-TB rule: a FIXED 64/256 layout at 32M turns made partition
    # tasks 2× chunkier and the 32-CPU wall superlinear (measured 58 s
    # fixed → 37 s sized; 16M and below are unchanged by the formula).
    from intelligent_ocr_ray.pipelines.resumable import suggest_layout

    n_parts, n_read_blocks = suggest_layout(src, min_parts=256, min_blocks=64)

    # GRAFT_SPANREFS=1 runs the HEADLINE with span byte-thinning
    # (config.span_text_refs=True). Used for scaling experiments: the
    # 8→32 intra-box gap is memory-bandwidth-bound (BENCH/BASELINE.md
    # decomposition), so the −35%-bytes output layout is the direct
    # test of that diagnosis. Default off so the headline stays
    # byte-comparable across rounds.
    import dataclasses as _dc0

    from intelligent_ocr_ray.config import DEFAULT_CONFIG as _HC

    headline_cfg = _HC
    if os.environ.get("GRAFT_SPANREFS") == "1":
        headline_cfg = _dc0.replace(_HC, span_text_refs=True)

    headline = float("inf")
    for trial in range(N_TRIALS):  # best-of-N: multi-tenant host noise up to 4×
        out_dir = f"/tmp/ior_bench_out/cpus{NUM_CPUS}_t{trial}"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        run_resumable(
            src, out_dir, headline_cfg, num_parts=n_parts, fuse_extract=True,
            read_num_blocks=n_read_blocks,
        )
        headline = min(headline, time.perf_counter() - t0)
    results["flagship_extract"] = round(headline, 3)

    headline_only = os.environ.get("GRAFT_HEADLINE_ONLY") == "1"

    if not headline_only and os.environ.get("GRAFT_SPANREFS") != "1":
        # secondary: the same fused layout with span byte-thinning
        # (config.span_text_refs=True — spans carry (off, len) refs
        # into extracted_text instead of a duplicate copy; −35% output
        # bytes, schema.resolve_span_text() restores the default form
        # losslessly). Kept secondary so the headline stays
        # byte-comparable across rounds; skipped under GRAFT_SPANREFS=1,
        # where the headline above already IS the refs configuration.
        refs_cfg = _dc0.replace(_HC, span_text_refs=True)
        sr = float("inf")
        for trial in range(2):
            out_dir = f"/tmp/ior_bench_out/refs_cpus{NUM_CPUS}_t{trial}"
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.perf_counter()
            run_resumable(
                src, out_dir, refs_cfg, num_parts=n_parts, fuse_extract=True,
                read_num_blocks=n_read_blocks,
            )
            sr = min(sr, time.perf_counter() - t0)
        results["flagship_extract_spanrefs"] = round(sr, 3)

    if not headline_only:
        # secondary: the global-sort ordered flagship (single
        # totally-ordered output stream; the single-job path)
        gs = float("inf")
        for trial in range(2):
            out_dir = f"/tmp/ior_bench_out/gs_cpus{NUM_CPUS}_t{trial}"
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.perf_counter()
            write_extracted(flagship(src, ordered=True, batch_size=8192), out_dir)
            gs = min(gs, time.perf_counter() - t0)
        results["flagship_global_sort"] = round(gs, 3)

    # secondary pipelines (smaller weight, still timed)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in (
        "events_hourly",
        "events_hourly_users",
        "events_sessions",
        "events_quantiles",
        "pricing_summary",
        "exact_dedup",
        "minhash_dups",
        "ngram_jaccard_dups",
        "embedding_neardup",
        "ann_topk",
        "decontaminate",
        "top_docs_per_lang",
        "lang_rebalance",
        "repetition_stats",
        "window_dedup",
        "keyword_search",
        "rarity_score",
        "quantile_filter",
        "tfidf_topterms",
        "source_overlap",
    ):
        if name not in qs or headline_only:
            continue
        # best-of-2: a single run conflates worker-pool warmup + the
        # host's neighbor noise with the operator (minhash_dups
        # measured 2.7 s cold vs 0.83 s warm in the same window)
        best = float("inf")
        for _ in range(min(2, N_TRIALS)):
            t0 = time.perf_counter()
            res = qs[name](SF_DIR)
            # consume: aggregates are small → materializing IS the consume
            res.to_pandas()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)

    ray.shutdown()

    return {
        "metric": "flagship_extract_sec",
        "value": results["flagship_extract"],
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": n_rows,
        "throughput_rows_per_s": round(n_rows / headline, 1),
        "exact_match_rate": exact_match_rate(src),
        "cpu_ref_ms": cpu_ref_ms(),
        "cpu_ref_par_ms": cpu_ref_par_ms(),
    }


def exact_match_rate(src: str, sample_rows: int = 5000) -> float:
    """Fraction of sampled turns whose pipeline extraction equals the
    serial per-row oracle exactly (route, text, normalized, status)."""
    import os as _os

    import pyarrow.parquet as pq

    from intelligent_ocr_ray.config import DEFAULT_CONFIG
    from intelligent_ocr_ray.functions.extract import extract_turn
    from intelligent_ocr_ray.functions.variants import VariantMapper
    from intelligent_ocr_ray.stages.extractor import ExtractTurns

    f = sorted(p for p in _os.listdir(src) if p.endswith(".parquet"))[0]
    batch = pq.read_table(
        _os.path.join(src, f), columns=["conv_id", "turn_idx", "role", "text"]
    ).slice(0, sample_rows)
    got = ExtractTurns(DEFAULT_CONFIG)(batch).to_pylist()
    vm = VariantMapper(DEFAULT_CONFIG.variants_path)
    n_match = 0
    for row, text in zip(got, batch.column("text").to_pylist()):
        ext, _ = extract_turn(text, DEFAULT_CONFIG, None)
        normalized = None
        if ext.status == "ok" and ext.extracted_text and vm.needs_normalization(ext.extracted_text):
            cand = vm.normalize(ext.extracted_text)
            if cand != ext.extracted_text:
                normalized = cand
        if (
            row["extracted_text"] == ext.extracted_text
            and row["status"] == ext.status
            and row["route"] == ext.route
            and row["text_normalized"] == normalized
        ):
            n_match += 1
    return round(n_match / max(1, len(got)), 6)


def run_scaling() -> dict:
    """Same job in fresh processes at N and 4N CPUs (default 8 → 32;
    override with GRAFT_SCALE_LO/HI). Each level is best-of-2 inside the
    child (multi-tenant host noise); the full pipeline including the
    order-restore shuffle is what's timed."""
    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", str(lo_cpus * 4)))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = run(lo_cpus)
    hi = run(hi_cpus)
    thr_lo = lo["throughput_rows_per_s"]
    thr_hi = hi["throughput_rows_per_s"]
    eff = (thr_hi / thr_lo) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo_cpus,
        "cpus_hi": hi_cpus,
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "throughput_lo": thr_lo,
        "throughput_hi": thr_hi,
        "rows": hi["rows"],
        "sf": SF_DIR,
        "cpu_ref_ms_lo": lo.get("cpu_ref_ms"),
        "cpu_ref_ms_hi": hi.get("cpu_ref_ms"),
    }


def run_stats() -> None:
    """Dump per-operator Ray Data stats for the flagship pipeline —
    the measure-don't-guess view (stage wall/CPU, rows/bytes per block,
    throughput) used to drive the tuning recorded in BENCH/BASELINE.md."""
    import shutil

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    src = transcripts_dir()

    from intelligent_ocr_ray.pipelines.extract import flagship, write_extracted

    out_dir = "/tmp/ior_bench_out/stats"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = flagship(src, ordered=True, batch_size=8192)
    write_extracted(ds, out_dir)
    print(ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--stats" in sys.argv:
        run_stats()
    else:
        print(json.dumps(run_bench()))
