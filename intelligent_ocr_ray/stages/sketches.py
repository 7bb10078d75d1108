"""Mergeable cardinality sketch: KMV (k-minimum-values) distinct
counting per group — the sketch family a 100 TB pipeline uses where
exact COUNT(DISTINCT) would shuffle every value.

KMV (Bar-Yossef et al., the classic bottom-k estimator): hash every
value uniformly, keep the k smallest hashes per group; with the k-th
smallest hash interpreted as a fraction v/2⁶⁴ of the unit interval, the
estimate is (k-1)·2⁶⁴/v. Union-mergeable: the k smallest of a union are
the k smallest of the per-partial k-smallest sets — so per-batch
partials shrink the shuffle to ≤ k rows per (batch, group) and the
reduce is a tiny merge. If the merged set holds fewer than k values, no
partial ever truncated, so the count is EXACT (and emitted as such).

Unlike HLL, KMV with a fixed hash is fully deterministic — md5 here, so
the DuckDB oracle reproduces the estimator bit-for-bit (same hashes,
same k-th pick, same 128-bit integer division).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_K = 64
_SCALE = 1 << 64


def _md5_hex(vals: list) -> list[str]:
    # md5(CAST(v AS VARCHAR)) — identical string form on the SQL side
    # (scalar reference; the batch path is _md5_hex_strings)
    return [hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in vals]


def _md5_hex_strings(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """md5 hexdigest per value of an int/string Arrow array, digesting
    straight from the Arrow string buffers (offsets + memoryview
    slices — the `_md5_hash_strings` technique; no Python str(v),
    no per-value encode). Integers are cast to their decimal string
    form first (pc.cast ≡ str(v) ≡ DuckDB CAST(v AS VARCHAR) — the
    parity contract _check_value_type guards). Values must be
    non-null. Returns an object ndarray of hex strings (lexicographic
    comparability is the KMV ordering)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not len(arr):
        return np.empty(0, dtype=object)
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = pc.cast(arr, pa.string())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(
        bufs[1],
        dtype=off_dtype,
        count=len(arr) + 1,
        offset=arr.offset * np.dtype(off_dtype).itemsize,
    )
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    out = np.empty(len(arr), dtype=object)
    for i, (s, e) in enumerate(zip(offsets[:-1], offsets[1:])):
        out[i] = md5(data[s:e]).hexdigest()
    return out


def _check_value_type(t: pa.DataType) -> None:
    """Python str(v) mirrors DuckDB's CAST(v AS VARCHAR) ONLY for
    integers and strings — bools ('True' vs 'true') and floats
    ('1e+20' vs '100000000000000000000') silently break estimator
    parity, so reject them up front (ADVICE r2)."""
    if not (pa.types.is_integer(t) or pa.types.is_string(t) or pa.types.is_large_string(t)):
        raise TypeError(
            f"kmv_distinct value column must be integer or string (got {t}): "
            "str(v) must equal DuckDB's CAST(v AS VARCHAR) for oracle "
            "parity — cast the column to one canonical form first"
        )


def _kmv_partial(batch: pa.Table, group_col: str, value_col: str, k: int) -> pa.Table:
    """Per-batch combiner: distinct (group, value) → md5 hex → k
    smallest per group. Output ≤ k rows per group per batch."""
    sel = batch.select([group_col, value_col])
    _check_value_type(sel.column(value_col).type)
    # null values are excluded on BOTH sides (md5(NULL) is NULL in the
    # oracle; str(None) would hash the literal 'None' here)
    sel = sel.filter(pc.is_valid(sel.column(value_col)))
    pairs = sel.group_by([group_col, value_col]).aggregate([])
    # segment by batch-local dictionary codes, NOT raw group values:
    # object-array lexsort dies comparing None < str, and a NULL group
    # is a real group (SQL GROUP BY keeps it)
    codes = np.asarray(
        pairs.column(group_col).combine_chunks().dictionary_encode().indices.fill_null(-1),
        dtype=np.int64,
    )
    hx = _md5_hex_strings(pairs.column(value_col))
    order = np.lexsort((hx, codes))
    codes_s = codes[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1, [len(codes_s)]]
    )
    keep = np.concatenate(
        [np.arange(starts[i], min(starts[i] + k, starts[i + 1]))
         for i in range(len(starts) - 1)]
    ) if len(codes_s) else np.array([], dtype=np.int64)
    kept = order[keep] if len(keep) else np.array([], dtype=np.int64)
    return pa.table(
        {
            group_col: pairs.column(group_col).take(pa.array(kept, pa.int64())),
            "hx": pa.array(list(hx[kept]), pa.string()),
        }
    )


def kmv_distinct(ds, group_col: str, value_col: str, k: int = DEFAULT_K):
    """Approximate COUNT(DISTINCT value) per group via a KMV sketch.
    Returns (group, n_distinct_est): exact when the group has fewer than
    k distinct values, else the bottom-k estimate (relative std error
    ≈ 1/√(k−2) ≈ 13% at k=64). Deterministic → DuckDB-oracled."""
    import functools

    partials = ds.map_batches(
        functools.partial(_kmv_partial, group_col=group_col, value_col=value_col, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def merge(part: pa.Table) -> pa.Table:
        # a kpart partition may hold SEVERAL groups (hash co-location)
        # including the NULL group — segment by dictionary codes and
        # finish each group's bottom-k independently
        t = part.drop_columns(["kpart"])
        if t.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], t.column(group_col).type),
                    "n_distinct_est": pa.array([], pa.int64()),
                }
            )
        codes = np.asarray(
            t.column(group_col).combine_chunks().dictionary_encode().indices.fill_null(-1),
            dtype=np.int64,
        )
        hx = np.asarray(t.column("hx").combine_chunks(), dtype=object)
        order = np.lexsort((hx, codes))
        codes_s, hx_s = codes[order], hx[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1, [len(codes_s)]]
        )
        rep_rows, ests = [], []
        for i in range(len(bounds) - 1):
            u = np.unique(hx_s[bounds[i] : bounds[i + 1]])  # sorted distinct
            if len(u) < k:
                est = len(u)  # no partial truncated → exact
            else:
                est = (k - 1) * _SCALE // max(int(u[k - 1][:16], 16), 1)
            rep_rows.append(int(order[bounds[i]]))
            ests.append(est)
        return pa.table(
            {
                group_col: t.column(group_col).take(pa.array(rep_rows, pa.int64())),
                "n_distinct_est": pa.array(ests, pa.int64()),
            }
        )

    from ..io_utils import null_safe_kpart

    parted = partials.map_batches(
        lambda t: null_safe_kpart(t, [group_col], 32),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return parted.groupby("kpart").map_groups(merge, batch_format="pyarrow")


# --- Count-Min sketch (mergeable heavy-hitter counts) ----------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
_CMS_P = 2147483647  # 2^31 - 1 (every product stays < 2^63)


def _cms_coeffs(d: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row universal-hash coefficients, md5-derived so the DuckDB
    oracle computes the IDENTICAL integers from the same strings."""
    from .dedup import _md5_low64

    a = np.array(
        [(_md5_low64(f"cms-a-{r}".encode()) % (_CMS_P - 1)) + 1 for r in range(d)],
        dtype=np.uint64,
    )
    b = np.array(
        [_md5_low64(f"cms-b-{r}".encode()) % _CMS_P for r in range(d)],
        dtype=np.uint64,
    )
    return a, b


def cms_token_counts(
    ds,
    query_tokens: tuple[str, ...],
    *,
    d: int = CMS_DEPTH,
    w: int = CMS_WIDTH,
    text_col: str = "text",
) -> pa.Table:
    """Count-Min sketch estimate of each query token's total instance
    count — the mergeable heavy-hitter counter for streams where the
    exact vocabulary is too wide to shuffle (Cormode & Muthukrishnan):
    guaranteed est >= true, overestimate bounded by collisions in w
    cells.

    Hash r of a token = (a_r * (md5_64(token) % 2^32) + b_r) mod
    (2^31-1) mod w — the minhash discipline: md5-derived modular
    arithmetic the oracle replays verbatim, every intermediate < 2^63
    so numpy uint64 and DuckDB HUGEINT agree bit-for-bit.

    Scale shape: each batch reduces to a (d x w) int64 count matrix
    (one md5 pass over the batch's DISTINCT tokens, then d modular
    transforms + scatter-adds); matrices are elementwise-mergeable, so
    the shuffle carries <= d*w (cell, n) rows per batch and one tiny
    int-keyed groupby finishes. The driver sees only the d*w matrix.
    Returns (token, est_count) for the queried tokens, token ASC.
    """
    from ray.data.aggregate import Sum

    from .dedup import _md5_hash_strings, _md5_low64, _tokenized_rows

    a, b = _cms_coeffs(d)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"rc": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        tr = _tokenized_rows(t.column(text_col))
        if tr is None:
            return empty
        _, toks = tr
        flat = toks.flatten()
        if not len(flat):
            return empty
        uniq32, idx = _md5_hash_strings(flat, bits=32, encoded=True)
        per_uniq = np.bincount(idx, minlength=len(uniq32)).astype(np.int64)
        mat = np.zeros((d, w), np.int64)
        for r in range(d):
            h = ((a[r] * uniq32 + b[r]) % np.uint64(_CMS_P)) % np.uint64(w)
            np.add.at(mat[r], h.astype(np.int64), per_uniq)
        rr, cc = np.nonzero(mat)
        return pa.table(
            {
                "rc": pa.array(rr * w + cc, pa.int64()),
                "n": pa.array(mat[rr, cc], pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("rc")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    mat = np.zeros((d, w), np.int64)
    if len(cells):
        rc = cells["rc"].to_numpy(dtype=np.int64)
        mat[rc // w, rc % w] = cells["n"].to_numpy(dtype=np.int64)

    out_tokens = sorted(set(query_tokens))
    ests = []
    for q in out_tokens:
        base = np.uint64(_md5_low64(q.encode("utf-8")) & 0xFFFFFFFF)
        est = min(
            int(mat[r, int(((a[r] * base + b[r]) % np.uint64(_CMS_P)) % np.uint64(w))])
            for r in range(d)
        )
        ests.append(est)
    return pa.table(
        {
            "token": pa.array(out_tokens, pa.string()),
            "est_count": pa.array(ests, pa.int64()),
        }
    )


# --- exact distributed quantiles (histogram CDF walk) ---------------------


def group_quantiles(
    ds,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    *,
    labels: tuple[str, ...] | None = None,
):
    """EXACT per-group quantiles of a money-like column at 100 TB scale:
    values are integer cents, so per-batch (group, cents)->count
    histogram partials shrink the shuffle from O(rows) to O(distinct
    cents per group per batch); each group's final task sorts its
    histogram and walks the CDF. No full-column sort, no sampling —
    exactness comes from the bounded value domain, the same trick the
    vocab/dedup pipelines use (pre-reduce before the one shuffle).

    Quantile index rule pinned to DuckDB's quantile_disc (measured):
    element at max(0, ceil(q*n) - 1) of the sorted multiset, computed
    with the same double multiply so the oracle agrees bit-for-bit.
    Null values are excluded on both sides."""
    import math

    if labels is None:
        labels = tuple(f"p{int(round(q * 100)):02d}_cents" for q in qs)

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        keep = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            # Arrow NaN is a VALID float, not a null — exclude it like
            # null (oracle mirror: WHERE v IS NOT NULL AND NOT isnan(v))
            keep = pc.and_(keep, pc.invert(pc.is_nan(v).fill_null(True)))
        t = t.select([group_col, value_col]).filter(keep)
        cents = pc.cast(
            pc.round(pc.multiply(t.column(value_col), 100.0), ndigits=0), pa.int64()
        )
        h = pa.table({group_col: t.column(group_col), "cents": cents})
        g = h.group_by([group_col, "cents"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "cents", "n"])

    def finish(part: pa.Table) -> pa.Table:
        # a kpart partition may hold several groups (incl. the NULL
        # group): merge histograms per (group, cents) with pyarrow's
        # null-safe group_by, then one CDF walk per group segment
        t = part.drop_columns(["kpart"])
        gtype = t.column(group_col).type
        if t.num_rows == 0:
            cols: dict = {group_col: pa.array([], gtype)}
            for lab in labels:
                cols[lab] = pa.array([], pa.int64())
            cols["n_values"] = pa.array([], pa.int64())
            return pa.table(cols)
        m = t.group_by([group_col, "cents"]).aggregate([("n", "sum")])
        codes = np.asarray(
            m.column(group_col).combine_chunks().dictionary_encode().indices.fill_null(-1),
            dtype=np.int64,
        )
        cents = np.asarray(m.column("cents"), dtype=np.int64)
        counts = np.asarray(m.column("n_sum"), dtype=np.int64)
        order = np.lexsort((cents, codes))
        codes_s, cents_s, counts_s = codes[order], cents[order], counts[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1, [len(codes_s)]]
        )
        rep_rows, qcols, nvals = [], [[] for _ in qs], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            cum = np.cumsum(counts_s[lo:hi])
            n = int(cum[-1])
            for j, q in enumerate(qs):
                idx = max(0, math.ceil(q * n) - 1)  # = DuckDB quantile_disc
                pos = int(np.searchsorted(cum, idx + 1, side="left"))
                qcols[j].append(int(cents_s[lo + pos]))
            rep_rows.append(int(order[lo]))
            nvals.append(n)
        cols = {group_col: m.column(group_col).take(pa.array(rep_rows, pa.int64()))}
        for lab, vals in zip(labels, qcols):
            cols[lab] = pa.array(vals, pa.int64())
        cols["n_values"] = pa.array(nvals, pa.int64())
        return pa.table(cols)

    from ..io_utils import null_safe_kpart

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parted = partials.map_batches(
        lambda t: null_safe_kpart(t, [group_col], 32),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return parted.groupby("kpart").map_groups(finish, batch_format="pyarrow")
