"""Deterministic sampling / dataset splitting — operators the reference
lacks entirely (SURVEY.md §2.6: "No top-k, limit, or sampling operators
exist") but any training-data pipeline needs: reproducible row sampling
and train/valid/test assignment that is a pure function of the row key
(stable under re-runs, resumes, and repartitioning — unlike
ds.random_sample, whose output depends on execution layout).

The hash is TWO Lehmer multiplicative-congruence steps over int64 —
chosen so the DuckDB oracle can run the IDENTICAL integer arithmetic
(`((id*48271 % M) * 48271) % M`, M = 2^31-1): every product stays under
2^63, so both engines compute exact, overflow-free results. Two steps,
not one: a single step is monotone for small ids and maps STRIDED id
sets (e.g. ids ≡ 0 mod 4 — exactly what interleaved group assignment
produces) onto coarse residue classes of the bucket modulus, which
biased per-group rates by several points (caught by the rebalance
test; sample_matrix hit the same aliasing in round 2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_LEHMER_A = 48271
_LEHMER_M = 2147483647  # 2^31 - 1


def _bucket(ids: pa.ChunkedArray | pa.Array, buckets: int = 100) -> np.ndarray:
    v = np.asarray(pc.cast(ids, pa.int64()))
    h = (v * _LEHMER_A) % _LEHMER_M
    return ((h * _LEHMER_A) % _LEHMER_M) % buckets


def sample_batch(batch: pa.Table, rate_pct: int, id_col: str = "doc_id") -> pa.Table:
    """Keep ~rate_pct% of rows, deterministically by id hash."""
    return batch.filter(pa.array(_bucket(batch.column(id_col)) < rate_pct))


def split_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    train_pct: int = 80,
    valid_pct: int = 10,
) -> pa.Table:
    """Append a `split` column: 'train' | 'valid' | 'test' assigned by
    id hash — every engine and every re-run agrees on the assignment."""
    b = _bucket(batch.column(id_col))
    split = np.where(
        b < train_pct, "train", np.where(b < train_pct + valid_pct, "valid", "test")
    )
    return batch.append_column("split", pa.array(split, pa.string()))


def weighted_sample_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap_pct: int = 80,
) -> pa.Table:
    """Importance-weighted deterministic sampling — the data-mixing
    step that keeps a document with probability proportional to a
    per-row QUALITY WEIGHT instead of a flat rate (here: token count
    capped at ``cap_pct``%, the "longer docs are likelier kept" mixing
    rule; swap the weight expression for any integer per-row score).
    A row survives iff its Lehmer id-hash bucket < min(n_tokens,
    cap_pct) — a pure function of (id, text), stable under re-runs and
    partitioning, with the weight arithmetic (LEAST + the two-step
    Lehmer replay) expressible verbatim in the oracle SQL."""
    from .text_stats import TOKEN_PATTERN

    n_tokens = pc.cast(
        pc.count_substring_regex(
            pc.coalesce(batch.column(text_col), pa.scalar("", pa.string())),
            TOKEN_PATTERN,
        ),
        pa.int64(),
    )
    weight = np.minimum(np.asarray(n_tokens, dtype=np.int64), cap_pct)
    b = _bucket(batch.column(id_col))
    out = batch.append_column("n_tokens", n_tokens)
    return out.filter(pa.array(b < weight))


def sample_docs(sf_dir: str, rate_pct: int = 10):
    import functools
    import os

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"])
    return ds.map_batches(
        functools.partial(sample_batch, rate_pct=rate_pct),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def dataset_split(sf_dir: str):
    import os

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    return ds.map_batches(split_batch, batch_format="pyarrow", zero_copy_batch=True)


def rebalance_batch(
    batch: pa.Table,
    rates: dict[str, int],
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_pct: int = 100,
) -> pa.Table:
    """Per-group deterministic downsampling — the corpus REBALANCING
    step of a pretraining pipeline (e.g. cap the dominant language at
    N%, keep the rest whole): a row survives iff its id-hash bucket is
    below its group's rate. Pure function of (id, group) → stable under
    re-runs and any partitioning, and expressible verbatim in the
    oracle's CASE over the same Lehmer arithmetic."""
    b = _bucket(batch.column(id_col))
    groups = np.asarray(batch.column(group_col), dtype=object)
    thresh = np.full(len(groups), default_pct, dtype=np.int64)
    for g, pct in rates.items():
        thresh[groups == g] = pct
    return batch.filter(pa.array(b < thresh))


def rebalance_corpus(sf_dir: str, rates: dict[str, int] | None = None):
    """documents rebalanced per language (default: cap 'en' at 25%,
    'cjk' at 50%, keep the rest)."""
    import functools

    import os

    import ray.data as rd

    if rates is None:
        rates = {"en": 25, "cjk": 50}
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "n_chars"]
    )
    return ds.map_batches(
        functools.partial(rebalance_batch, rates=rates),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
