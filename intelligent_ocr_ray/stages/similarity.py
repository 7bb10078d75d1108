"""Similarity search over an embedding column (`list<float>`):
exact cosine near-dup via block-pair tasks, brute-force cosine top-k
(broadcast-queries baseline), an IVF-bucketed approximate top-k, and a
multi-assign-bucketed approximate near-dup (the sub-quadratic path).

Broadcast discipline: only genuinely SMALL sides are broadcast — the
query matrix (a handful of vectors) and the centroid table (n_lists × d)
— via `ray.put` once, read zero-copy in every task. The CORPUS is never
broadcast and never materialized on the driver:

* exact near-dup runs as tasks over PAIRS of object-store blocks (each
  task holds exactly two blocks — bounded memory at any corpus size;
  the O(n²) compute is inherent to the exact operator and is spread
  across tasks instead of replicated per actor);
* centroid training reads a deterministic id-hash SAMPLE (bounded rows)
  computed inside Ray, not the full table;
* query vectors come from a predicate-pushdown parquet read that only
  decodes the matching rows.

Float parity with the DuckDB oracle: cosine is computed in float64 on
both sides and emitted as `cos_micros = round_half_even(cos·1e6)`
(np.round ≡ DuckDB round_even); raw doubles differ in the last bits
between numpy's blocked matmul and DuckDB's sequential
list_cosine_similarity, so never hash the raw double.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EMB_COL = "embedding"
ID_COL = "vec_id"

# Bounded driver/worker-side sample for centroid training; at any corpus
# size only ~this many vectors are pulled out of Ray.
CENTROID_SAMPLE_ROWS = 4096


def _matrix(batch: pa.Table, col: str = EMB_COL) -> np.ndarray:
    """(n, d) float64 matrix from a fixed-width list<float> column."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def _cos_micros(cos: np.ndarray) -> np.ndarray:
    return np.round(cos * 1e6).astype(np.int64)  # half-even, = round_even


def read_embeddings(
    parquet_path: str,
    columns=(ID_COL, EMB_COL),
    *,
    rows_per_block: int = 65536,
    min_blocks: int = 8,
):
    """Metadata-sized embeddings read (~64k vectors per block; io_utils
    rationale — downstream groupbys pay per block pair)."""
    from ..io_utils import sized_read_parquet

    return sized_read_parquet(
        parquet_path, list(columns),
        rows_per_block=rows_per_block, min_blocks=min_blocks,
    )


def load_matrix(parquet_path: str, columns=(ID_COL, EMB_COL)) -> tuple[np.ndarray, np.ndarray]:
    """Whole-table (ids, normalized matrix) load — TEST-ORACLE HELPER
    ONLY (brute-force comparisons in tests/). No pipeline operator calls
    this; at corpus scale the full matrix never lands on one machine."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=list(columns))
    ids = np.asarray(t.column(columns[0]), dtype=np.int64)
    return ids, _normalize(_matrix(t, columns[1]))


def load_queries(parquet_path: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Pruned read of the query vectors (vec_id < n_queries): the filter
    is pushed into the parquet scan, so only matching row groups are
    read and only matching rows decoded — never the whole table."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        parquet_path,
        columns=[ID_COL, EMB_COL],
        filters=[(ID_COL, "<", n_queries)],
    )
    ids = np.asarray(t.column(ID_COL), dtype=np.int64)
    return ids, _normalize(_matrix(t))


# --- exact cosine near-dup (block-pair tasks) -----------------------------


def _block_pairs(
    ta: pa.Table, tb: pa.Table | None, threshold: float
) -> pa.Table:
    """Exact cosine-≥-τ pairs between two blocks (tb=None → within one
    block). Pairs are oriented vec_id_a < vec_id_b, so each unordered
    pair is emitted by exactly one (i ≤ j) block-pair task."""
    ids_a = np.asarray(ta.column(ID_COL), dtype=np.int64)
    ma = _normalize(_matrix(ta))
    if tb is None:
        sims = ma @ ma.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        ia, ib = ids_a[ai], ids_a[bi]
        cos = sims[ai, bi]
        keep = ia != ib  # defensive: duplicate ids within one block
        ia, ib, cos = ia[keep], ib[keep], cos[keep]
    else:
        ids_b = np.asarray(tb.column(ID_COL), dtype=np.int64)
        mb = _normalize(_matrix(tb))
        sims = ma @ mb.T
        ai, bi = np.nonzero(sims >= threshold)
        ia, ib = ids_a[ai], ids_b[bi]
        cos = sims[ai, bi]
        keep = ia != ib  # defensive: duplicate ids across blocks
        ia, ib, cos = ia[keep], ib[keep], cos[keep]
    lo = np.minimum(ia, ib)
    hi = np.maximum(ia, ib)
    return pa.table(
        {
            "vec_id_a": pa.array(lo, pa.int64()),
            "vec_id_b": pa.array(hi, pa.int64()),
            "cos_micros": pa.array(_cos_micros(cos), pa.int64()),
        }
    )


## Above this many corpus blocks the exact operator's n_blocks² driver
## ref-pair loop itself becomes the bottleneck (~32k task submissions);
## past it the bucketed variant is the intended path.
MAX_EXACT_BLOCKS = 256


def embedding_neardup(
    sf_dir: str,
    threshold: float = 0.95,
    *,
    block_rows: int = 4096,
    max_blocks: int = MAX_EXACT_BLOCKS,
):
    """EXACT pairs of embeddings with cosine ≥ τ.

    Scale shape: the corpus is materialized once into object-store
    blocks of ~block_rows vectors; one Ray task per block pair (i ≤ j)
    fetches exactly TWO blocks (zero-copy plasma reads) and emits its
    pairs. No task, actor or the driver ever holds more than two blocks
    — memory is bounded at any corpus size, and the inherent O(n²)
    exact compute is spread over n_blocks² independent tasks that the
    scheduler streams. For a sub-quadratic approximation use
    :func:`embedding_neardup_bucketed`."""
    import math
    import os

    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    n_rows = pq.read_metadata(path).num_rows
    n_blocks = max(1, math.ceil(n_rows / block_rows))
    if n_blocks > max_blocks:
        raise ValueError(
            f"embedding_neardup is the EXACT O(n²) operator: {n_blocks} corpus "
            f"blocks would submit {n_blocks * (n_blocks + 1) // 2} block-pair "
            f"tasks (> max_blocks={max_blocks} crossover). Use "
            "embedding_neardup_bucketed (sub-quadratic, measured recall "
            "0.96-0.97) at this scale, or raise block_rows/max_blocks "
            "explicitly if the quadratic cost is intended."
        )
    ds = rd.read_parquet(
        path, columns=[ID_COL, EMB_COL], override_num_blocks=n_blocks
    )
    refs = ds.materialize().to_arrow_refs()

    @ray.remote
    def pair_task(ta: pa.Table, tb: pa.Table | None) -> pa.Table:
        return _block_pairs(ta, tb, threshold)

    out = []
    for i in range(len(refs)):
        out.append(pair_task.remote(refs[i], None))
        for j in range(i + 1, len(refs)):
            out.append(pair_task.remote(refs[i], refs[j]))
    return rd.from_arrow_refs(out)


# --- approximate near-dup (multi-assign centroid buckets) -----------------


def embedding_neardup_bucketed(
    sf_dir: str,
    threshold: float = 0.4,
    *,
    n_lists: int = 16,
    n_assign: int = 4,
    concurrency=2,
):
    """APPROXIMATE cosine-≥-τ pairs: each vector is assigned to its
    `n_assign` nearest centroid buckets; candidate pairs are generated
    only WITHIN buckets (exact cosine verified there), so compute drops
    from O(n²) to Σ_buckets O(m_b²) — the sub-quadratic scale path. A
    pair is missed iff the two vectors share no bucket; recall vs the
    exact operator is pytest-measured (multi-assignment is the recall
    knob). Same shuffle discipline as the text LSH pipelines: centroids
    broadcast via ray.put, one bucket groupby, vectorized verify."""
    import os

    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    _, sample = sample_matrix(path, CENTROID_SAMPLE_ROWS)
    cents = _centroids(sample, n_lists)
    cents_ref = ray.put(cents)

    class AssignMulti:
        def __init__(self):
            self.cents = ray.get(cents_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bm = _normalize(_matrix(batch))
            sims = bm @ self.cents.T
            k = min(n_assign, sims.shape[1])
            top = np.argpartition(-sims, k - 1, axis=1)[:, :k].astype(np.int32)
            n = len(bm)
            ids = np.repeat(np.asarray(batch.column(ID_COL), dtype=np.int64), k)
            # embeddings ride along so the bucket group verifies locally
            emb = batch.column(EMB_COL)
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            emb_rep = emb.take(pa.array(np.repeat(np.arange(n), k)))
            return pa.table(
                {
                    ID_COL: pa.array(ids, pa.int64()),
                    "bucket": pa.array(top.reshape(-1), pa.int32()),
                    EMB_COL: emb_rep,
                }
            )

    ds = read_embeddings(path)
    bucketed = ds.map_batches(
        AssignMulti,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=0.5,
    )

    def verify_bucket(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(ID_COL), dtype=np.int64)
        m = _normalize(_matrix(group))
        sims = m @ m.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        ia, ib = ids[ai], ids[bi]
        keep = ia != ib  # same vector can share a bucket via 2 assigns
        ia, ib = ia[keep], ib[keep]
        cos = sims[ai, bi][keep]
        return pa.table(
            {
                "vec_id_a": pa.array(np.minimum(ia, ib), pa.int64()),
                "vec_id_b": pa.array(np.maximum(ia, ib), pa.int64()),
                "cos_micros": pa.array(_cos_micros(cos), pa.int64()),
            }
        )

    cand = bucketed.groupby("bucket").map_groups(verify_bucket, batch_format="pyarrow")
    # a pair appears once per shared bucket; cos is identical each time
    from ray.data.aggregate import Max

    return cand.groupby(["vec_id_a", "vec_id_b"]).aggregate(
        Max("cos_micros", alias_name="cos_micros")
    )


# --- brute-force cosine top-k ---------------------------------------------


class TopKPartial:
    """Per-batch partial top-k of corpus rows against the broadcast
    query matrix — the combiner that keeps the final reduce tiny
    (k × n_blocks rows per query instead of the whole corpus)."""

    def __init__(self, queries_ref, k: int):
        import ray

        self.qids, self.qmat = ray.get(queries_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        bids = np.asarray(batch.column(ID_COL), dtype=np.int64)
        bm = _normalize(_matrix(batch))
        sims = self.qmat @ bm.T  # (q, b)
        out_q: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            mask = bids != qid  # a query is not its own neighbor
            cand_ids, cand_cos = bids[mask], row[mask]
            if len(cand_ids) > self.k:
                # truncation must apply the SAME total order as the
                # final reduce (cos desc, neighbor_id asc): a plain
                # argpartition keeps an arbitrary subset of cos TIES at
                # the k boundary and could drop the id the oracle ranks
                keep = np.lexsort((cand_ids, -cand_cos))[: self.k]
                cand_ids, cand_cos = cand_ids[keep], cand_cos[keep]
            out_q.append(np.full(len(cand_ids), qid, dtype=np.int64))
            out_n.append(cand_ids)
            out_c.append(cand_cos)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cos": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )


def _final_topk(group: pa.Table, k: int) -> pa.Table:
    q = group.column("query_id")[0].as_py()
    nid = np.asarray(group.column("neighbor_id"))
    cos = np.asarray(group.column("cos"))
    # stable total order: cos desc, neighbor_id asc (tie-break mirrors
    # the oracle's ORDER BY cos DESC, neighbor_id)
    order = np.lexsort((nid, -cos))[:k]
    return pa.table(
        {
            "query_id": pa.array(np.full(len(order), q, dtype=np.int64), pa.int64()),
            "neighbor_id": pa.array(nid[order], pa.int64()),
            "cos_micros": pa.array(_cos_micros(cos[order]), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        }
    )


def _topk_partial_task(batch: pa.Table, *, queries_ref, k: int) -> pa.Table:
    """Stateless-task form of TopKPartial: the broadcast query matrix is
    a zero-copy plasma read per task (µs — numpy over shared memory),
    so the stage runs with ELASTIC parallelism instead of a fixed actor
    pool. The same fixed-2-actor shape was measured as the whole
    pipeline's bottleneck for minhash; the actor form remains available
    via ``concurrency``."""
    return TopKPartial(queries_ref, k)(batch)


def ann_topk(sf_dir: str, n_queries: int = 8, k: int = 10, *, concurrency=None):
    """Exact cosine top-k per query vector: broadcast queries (pruned
    predicate-pushdown read — the corpus table is never loaded on the
    driver) → per-batch partial top-k → per-query final reduce.

    ``concurrency=None`` (default) runs the partial stage as elastic
    tasks; pass an int to pin an actor pool instead (useful when
    embedding this stage in a larger job that must not grab every
    core)."""
    import functools
    import os

    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    queries_ref = ray.put(load_queries(path, n_queries))
    ds = read_embeddings(path)
    if concurrency is None:
        partial = ds.map_batches(
            functools.partial(_topk_partial_task, queries_ref=queries_ref, k=k),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        partial = ds.map_batches(
            TopKPartial,
            fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
            num_cpus=0.5,
        )
    return partial.groupby("query_id").map_groups(
        functools.partial(_final_topk, k=k), batch_format="pyarrow"
    )


# --- IVF-bucketed approximate top-k (scale path) --------------------------


def sample_matrix(parquet_path: str, target_rows: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic bounded sample of the embedding table, computed
    INSIDE Ray: a Lehmer id-hash filter (the sampling.py discipline —
    reproducible under any execution layout) keeps ~target_rows rows;
    only those leave the cluster. The driver never holds more than the
    sample regardless of corpus size."""
    import pyarrow.parquet as pq
    import ray.data as rd

    n_rows = pq.read_metadata(parquet_path).num_rows
    ds = read_embeddings(parquet_path)
    if n_rows > target_rows:
        # fine-grained threshold (not an integer-percent floor): the
        # kept fraction tracks target_rows/n_rows, so the sample stays
        # ~target_rows at ANY corpus size instead of growing as n/100.
        # TWO Lehmer steps: a single id·48271 mod M is monotone for
        # consecutive small ids (never wraps below id≈44k), so a raw
        # threshold compare would keep a contiguous prefix; the second
        # step equidistributes before the compare.
        thresh = max(1, (target_rows * 2147483647) // n_rows)

        def keep(t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column(ID_COL), dtype=np.int64)
            h = (((ids * 48271) % 2147483647) * 48271) % 2147483647
            sel = h < thresh
            return t.filter(pa.array(sel))

        ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    t = ds.take_batch(n_rows, batch_format="pyarrow")
    ids = np.asarray(t.column(ID_COL), dtype=np.int64)
    mat = _normalize(_matrix(t))
    order = np.argsort(ids)  # layout-independent determinism
    return ids[order], mat[order]


def _centroids(
    mat: np.ndarray, n_lists: int, seed: int = 13, iters: int = 5
) -> np.ndarray:
    """Deterministic spherical k-means over the (bounded) training
    sample: seeded sample init + a few Lloyd iterations (cosine
    assignment, renormalized means)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(mat), size=min(n_lists, len(mat)), replace=False)
    cents = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


class _AssignBuckets:
    def __init__(self, cents_ref):
        import ray

        self.cents = ray.get(cents_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bm = _normalize(_matrix(batch))
        bucket = np.argmax(bm @ self.cents.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket, pa.int32()))


def ivf_topk(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    *,
    n_lists: int = 16,
    nprobe: int = 8,
    concurrency=2,
):
    """IVF-style approximate top-k: corpus hash-partitioned into
    centroid buckets (groupby — the only shuffle), each query searched
    only in its `nprobe` nearest buckets. Per-bucket groups do a local
    exact top-k for the queries probing them; the final per-query
    reduce merges ≤ nprobe × k candidates. At 100 TB the bucket groupby
    replaces any corpus broadcast — each group holds ~1/n_lists of the
    data and queries are the broadcast side. Centroids are trained on a
    bounded Ray-side sample; queries come from a pruned read."""
    import functools
    import os

    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    _, sample = sample_matrix(path, CENTROID_SAMPLE_ROWS)
    cents = _centroids(sample, n_lists)
    qids, qmat = load_queries(path, n_queries)
    # per-query probe lists (q, nprobe)
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    cents_ref = ray.put(cents)
    queries_ref = ray.put((qids, qmat, probes))

    ds = read_embeddings(path)
    bucketed = ds.map_batches(
        _AssignBuckets,
        fn_constructor_kwargs={"cents_ref": cents_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=0.5,
    )

    def search_bucket(group: pa.Table) -> pa.Table:
        import ray

        gqids, gqmat, gprobes = ray.get(queries_ref)
        bucket = group.column("bucket")[0].as_py()
        probing = [
            qi for qi in range(len(gqids)) if bucket in gprobes[qi]
        ]
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
        if not probing:
            return empty
        bids = np.asarray(group.column(ID_COL), dtype=np.int64)
        bm = _normalize(_matrix(group))
        sims = gqmat[probing] @ bm.T
        qs, ns, cs = [], [], []
        for row, qi in zip(sims, probing):
            qid = gqids[qi]
            mask = bids != qid
            cid, cc = bids[mask], row[mask]
            if len(cid) > k:
                # same (cos desc, id asc) tie-break as the final reduce
                keep = np.lexsort((cid, -cc))[:k]
                cid, cc = cid[keep], cc[keep]
            qs.append(np.full(len(cid), qid, dtype=np.int64))
            ns.append(cid)
            cs.append(cc)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qs), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(ns), pa.int64()),
                "cos": pa.array(np.concatenate(cs), pa.float64()),
            }
        )

    cand = bucketed.groupby("bucket").map_groups(search_bucket, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(
        functools.partial(_final_topk, k=k), batch_format="pyarrow"
    )
