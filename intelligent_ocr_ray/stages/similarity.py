"""Similarity search over an embedding column (`list<float>`):
brute-force cosine top-k (baseline), all-pairs cosine near-dup, and an
IVF-bucketed approximate variant (the 100-TB scale path).

Broadcast discipline: the *query matrix* and *centroids* are genuinely
small sides → `ray.put` once, read zero-copy in every `map_batches`
task (never re-shipped per batch, never shuffled). The all-pairs
near-dup broadcast of the full corpus matrix is the test-scale
baseline only; its scale path is `ivf_topk`'s bucketing (search moves
to per-bucket groups, corpus never broadcast).

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


def load_matrix(parquet_path: str, columns=(ID_COL, EMB_COL)) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side load of (ids, normalized matrix) for broadcasting."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=list(columns))
    ids = np.asarray(t.column(columns[0]), dtype=np.int64)
    return ids, _normalize(_matrix(t, columns[1]))


# --- all-pairs cosine near-dup (baseline; corpus broadcast) ---------------


class CosineNearDup:
    """Actor-pool stage: each batch's vectors vs the broadcast corpus
    matrix (one ray.get per actor in __init__, zero-copy numpy view).
    Emits pairs (vec_id_a < vec_id_b, cos ≥ τ). O(n²) compute split
    across batches — correct baseline at test scale; use ivf_topk's
    bucketing when the corpus no longer fits a broadcast."""

    def __init__(self, corpus_ref, threshold: float):
        import ray

        self.ids, self.mat = ray.get(corpus_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        bids = np.asarray(batch.column(ID_COL), dtype=np.int64)
        bm = _normalize(_matrix(batch))
        sims = bm @ self.mat.T  # (b, n)
        bi, ci = np.nonzero(sims >= self.threshold)
        a, b = bids[bi], self.ids[ci]
        keep = a < b  # canonical orientation, drops self-pairs
        cos = sims[bi[keep], ci[keep]]
        return pa.table(
            {
                "vec_id_a": pa.array(a[keep], pa.int64()),
                "vec_id_b": pa.array(b[keep], pa.int64()),
                "cos_micros": pa.array(_cos_micros(cos), pa.int64()),
            }
        )


def embedding_neardup(sf_dir: str, threshold: float = 0.95, *, concurrency=2):
    """Pairs of embeddings with cosine ≥ τ (near-duplicate detection on
    the embedding column)."""
    import os

    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    corpus_ref = ray.put(load_matrix(path))
    ds = rd.read_parquet(path, columns=[ID_COL, EMB_COL])
    return ds.map_batches(
        CosineNearDup,
        fn_constructor_kwargs={"corpus_ref": corpus_ref, "threshold": threshold},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=0.5,
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
                part = np.argpartition(-cand_cos, self.k)[: self.k]
                cand_ids, cand_cos = cand_ids[part], cand_cos[part]
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


def ann_topk(sf_dir: str, n_queries: int = 8, k: int = 10, *, concurrency=2):
    """Exact cosine top-k per query vector: broadcast queries →
    per-batch partial top-k → per-query final reduce."""
    import functools
    import os

    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    ids, mat = load_matrix(path)
    sel = ids < n_queries
    queries_ref = ray.put((ids[sel], mat[sel]))
    ds = rd.read_parquet(path, columns=[ID_COL, EMB_COL])
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


def _centroids(
    mat: np.ndarray, n_lists: int, seed: int = 13, iters: int = 5
) -> np.ndarray:
    """Deterministic spherical k-means: seeded sample init + a few Lloyd
    iterations (cosine assignment, renormalized means). Deterministic by
    construction; swap for a real offline k-means at scale."""
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
    replaces the corpus broadcast entirely — each group holds ~1/n_lists
    of the data and queries are the broadcast side."""
    import functools
    import os

    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    ids, mat = load_matrix(path)
    cents = _centroids(mat, n_lists)
    sel = ids < n_queries
    qids, qmat = ids[sel], mat[sel]
    # per-query probe lists (q, nprobe)
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    cents_ref = ray.put(cents)
    queries_ref = ray.put((qids, qmat, probes))

    ds = rd.read_parquet(path, columns=[ID_COL, EMB_COL])
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
                part = np.argpartition(-cc, k)[:k]
                cid, cc = cid[part], cc[part]
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
