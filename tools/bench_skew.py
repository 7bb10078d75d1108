"""Salted-vs-unsalted fused-layout bench on a mega-conversation skew
fixture — the north rule's explicit skew story, measured end-to-end.

Fixture: the cached 16M-turn bench corpus PLUS one mega conversation
holding ~10% of all turns (1.6M rows — the one-key-pins-one-reducer
worst case). The fused layout hash-partitions by conv_id, so unsalted
the mega conversation lands wholly in ONE partition task whose
sort+extract+write runs ~25× the average partition and sets the wall
clock; ``salt_turns`` splits it into (conv_id, turn_idx // salt)
sub-keys that spread across partitions (pipelines/ordering.py), trading
whole-conversation contiguity (documented in run_resumable) for a flat
task profile.

Usage: python tools/bench_skew.py [mega_rows]  → one JSON line.
Record the result in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

MEGA_ROWS_DEFAULT = 800_000
BASE_CONVS = 1_200_000  # the cached 16M-turn bench corpus
SALT_TURNS = 8_192


def build_fixture(mega_rows: int) -> str:
    """Skew corpus dir = symlinks to the cached base shards + one extra
    shard holding the mega conversation (generated once, cached)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from intelligent_ocr_ray.sources.transcripts import cached_transcripts_dir

    base = cached_transcripts_dir(n_convs=BASE_CONVS, seed=42)
    out = f"/tmp/ior_skew/base{BASE_CONVS}_mega{mega_rows}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for f in sorted(os.listdir(base)):
        if f.endswith(".parquet"):
            os.symlink(os.path.join(base, f), os.path.join(out, f))
    # the mega conversation: UNIQUE html payloads so every row pays the
    # per-payload parser (the adversarial case — identical payloads
    # would be absorbed by the extractor's within-batch dedup, and
    # plain-text rows by the vectorized passthrough; neither stresses
    # the straggler)
    rng = np.random.RandomState(17)
    words = np.array(
        "the quick brown fox jumps over lazy dog alpha beta gamma delta "
        "epsilon zeta eta theta data pipeline turn".split()
    )
    picks = words[rng.randint(0, len(words), size=(mega_rows, 10))]
    texts = [
        f"<p>turn {i} {' '.join(row[:5])}</p><div>{' '.join(row[5:])}</div>"
        for i, row in enumerate(picks)
    ]
    n = mega_rows
    t = pa.table(
        {
            "conv_id": pa.nulls(n, pa.string()).fill_null("megaconv"),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32), pa.int32()),
            "role": pa.nulls(n, pa.string()).fill_null("user"),
            "text": pa.array(texts, pa.string()),
            "tool": pa.nulls(n, pa.string()).fill_null(""),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * 1_000_000, pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, os.path.join(out, "zz_mega.parquet"))
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def main() -> None:
    mega_rows = int(sys.argv[1]) if len(sys.argv) > 1 else MEGA_ROWS_DEFAULT
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from intelligent_ocr_ray.pipelines.resumable import run_resumable

    src = build_fixture(mega_rows)
    # warm the worker pool (first touch at 32 CPUs ≈ 20 s, unrelated)
    rd.read_parquet(src, columns=["conv_id"]).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    results: dict[str, float] = {}
    for label, salt in (("unsalted", None), ("salted", SALT_TURNS)):
        best = float("inf")
        for trial in range(2):
            out_dir = f"/tmp/ior_skew/out_{label}_t{trial}"
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.perf_counter()
            run_resumable(
                src,
                out_dir,
                num_parts=256,
                fuse_extract=True,
                read_num_blocks=64,
                salt_turns=salt,
            )
            best = min(best, time.perf_counter() - t0)
        results[label] = round(best, 3)
    ray.shutdown()
    print(
        json.dumps(
            {
                "metric": "skew_salted_vs_unsalted_sec",
                "mega_rows": mega_rows,
                "base_convs": BASE_CONVS,
                "salt_turns": SALT_TURNS,
                "unsalted_sec": results["unsalted"],
                "salted_sec": results["salted"],
                "speedup": round(results["unsalted"] / results["salted"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
