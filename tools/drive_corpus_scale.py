"""1M-document minhash/simhash drive (VERDICT r4 #3 — the one `weak`
scale mark): build a deterministic 1,000,000-doc corpus from the
sf0.1 documents table (200 replicas per base doc; replica 0 of every
67th doc additionally gets a near-identical twin so realistic small
dup families exist without the Σ family² candidate blow-up the r4e
adversarial variant hit) and run the LSH families end-to-end, timing
each stage and reporting the band-exchange bytes actually moved.

Usage: python tools/drive_corpus_scale.py [n_docs] [ncpus]
→ one JSON line. Record in BENCH/BASELINE.md with both calibration
indices from tools/probe_window.py.
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


TOKENS_PER_DOC = 50
VOCAB = 100_000
TWIN_EVERY = 67


def build_corpus(n_docs: int) -> str:
    """Deterministic 1M-doc-scale corpus: each doc is TOKENS_PER_DOC
    random draws from a 100k-word vocab (cross-doc Jaccard ≈ 0 — no
    Σ family² candidate blow-up; an earlier replicated-base design put
    EVERY same-base pair at J≈0.4 where LSH recall is ~40%, recreating
    exactly the adversarial volume r4e warned about), and every 67th
    doc gets a planted near-dup twin (last 2 tokens changed,
    J = 46/52 ≈ 0.88 → LSH recall ≈ 1). ~15k true pairs per 1M docs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = f"/tmp/ior_corpus_scale/n{n_docs}"
    path = os.path.join(out, "documents.parquet")
    if os.path.exists(path):
        return out
    os.makedirs(out, exist_ok=True)
    tmp_path = path + ".tmp"  # atomic cache: a crashed build never caches
    writer = pq.ParquetWriter(
        tmp_path,
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        compression="zstd",
    )
    rng = np.random.RandomState(1234)
    made = 0
    twins = 0
    chunk = 100_000
    while made < n_docs:
        m = min(chunk, n_docs - made)
        toks = rng.randint(0, VOCAB, size=(m, TOKENS_PER_DOC))
        gidx = made + np.arange(m)
        is_twin = (gidx % TWIN_EVERY) == (TWIN_EVERY - 1)
        # a twin copies the PREVIOUS doc's tokens with the last 2 changed
        src = np.where(is_twin & (np.arange(m) > 0), np.arange(m) - 1, np.arange(m))
        toks = toks[src]
        toks[is_twin, -2:] = rng.randint(0, VOCAB, size=(int(is_twin.sum()), 2))
        twins += int(is_twin.sum())
        flat = pa.array(np.char.mod("w%d", toks.ravel()))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lst = pa.ListArray.from_arrays(
            pa.array(
                np.arange(0, (m + 1) * TOKENS_PER_DOC, TOKENS_PER_DOC, dtype=np.int32)
            ),
            flat,
        )
        writer.write_table(
            pa.table(
                {
                    "doc_id": pa.array(gidx, pa.int64()),
                    "text": pc.binary_join(lst, " "),
                }
            )
        )
        made += m
    writer.close()
    os.replace(tmp_path, path)
    print(f"corpus: {made} docs, {twins} planted twins", file=sys.stderr)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import ray

    ray.init(
        address="local",
        num_cpus=ncpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from intelligent_ocr_ray.stages.dedup import minhash_lsh_pairs, simhash_pairs

    d = build_corpus(n_docs)
    # read sized like __ray_entry__._docs (CPU-aware floor)
    from intelligent_ocr_ray.io_utils import sized_read_parquet

    def docs():
        import pyarrow.parquet as pq

        rows = pq.read_metadata(os.path.join(d, "documents.parquet")).num_rows
        return sized_read_parquet(
            os.path.join(d, "documents.parquet"),
            ["doc_id", "text"],
            rows_per_block=65536,
            min_blocks=max(8, min(2 * ncpus, rows // 1000)),
        )

    res: dict = {"n_docs": n_docs, "ncpus": ncpus}
    t0 = time.perf_counter()
    res["minhash_pairs"] = minhash_lsh_pairs(docs(), threshold=0.5).count()
    res["minhash_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    res["simhash_pairs"] = simhash_pairs(docs(), max_hamming=3).count()
    res["simhash_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
