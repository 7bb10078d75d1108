"""Sessionize mega-user skew bench (VERDICT r4 #9): one bot user holds
~20% of all events; unsalted sessionize puts every one of its events in
ONE partition whose sort+scan sets the wall, while the time-chunked
variant (events.sessionize_salted) splits it into `time_salt` disjoint
time ranges and merges at session granularity.

Usage: python tools/bench_session_skew.py [n_events] [mega_share]
→ one JSON line {unsalted_sec, salted_sec, ratio, rows_match}.
Record the result in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)


def build_fixture(n: int, mega_share: float) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"/tmp/ior_session_skew/n{n}_s{int(mega_share * 100)}"
    path = os.path.join(out, "events.parquet")
    if os.path.exists(path):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(7)
    user = rng.randint(1, n // 100 + 2, n).astype(np.int64)
    user[: int(n * mega_share)] = 999_999_999  # the bot
    base = np.int64(1_700_000_000_000_000)
    ts = base + np.cumsum(rng.randint(1, 5 * 60 * 1_000_000, n).astype(np.int64))
    rng.shuffle(ts)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(rng.rand(n) * 100, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, path)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.20
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from intelligent_ocr_ray.pipelines.events import sessionize, sessionize_salted

    d = build_fixture(n, share)
    bal = build_fixture(n, 0.0)  # balanced reference corpus, same size
    # warm page cache + worker pool
    sessionize(bal, num_parts=64).count()

    best: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in (
        ("balanced", lambda: sessionize(bal, num_parts=64)),
        ("unsalted", lambda: sessionize(d, num_parts=64)),
        ("salted", lambda: sessionize_salted(d, num_parts=64, time_salt=16)),
    ):
        best[name] = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            rows[name] = fn().count()
            best[name] = min(best[name], time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "sessionize_skew",
                "n_events": n,
                "mega_share": share,
                "balanced_sec": round(best["balanced"], 3),
                "unsalted_sec": round(best["unsalted"], 3),
                "salted_sec": round(best["salted"], 3),
                # the north criterion: skewed wall (best mitigation)
                # within 1.5x of the balanced-corpus wall
                "skew_vs_balanced": round(
                    min(best["unsalted"], best["salted"]) / best["balanced"], 3
                ),
                "salted_vs_unsalted": round(best["salted"] / best["unsalted"], 3),
                "rows_match": rows["unsalted"] == rows["salted"],
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
