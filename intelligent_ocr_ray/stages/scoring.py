"""Corpus scoring & search: keyword top-k search, corpus-frequency
rarity scoring, and global-percentile filtering — training-data
operators layered on the token machinery of corpus.py / text_stats.py,
each with an exact DuckDB oracle twin (__ray_entry__.py).

Scale shapes (the engine's established two-pass disciplines):

* keyword_search — the query-term set is tiny by construction
  (broadcast in the task closure); scoring is one vectorized
  membership pass per batch; top-k is per-block partials followed by
  one k x num_blocks merge. No shuffle ever sees document text.
* rarity_score — pass 1 reuses ``vocab_topk`` (per-batch partial
  counts -> coarse token partitions -> tiny merge); the V-row
  frequency table broadcasts once via ``ray.put``. Pass 2 is a pure
  per-batch map. V is a fixed constant, so the broadcast never grows
  with corpus size (unlike decontaminate's benchmark set, which needs
  the size-crossover treatment).
* quantile_filter — pass 1 builds an exact integer histogram of the
  per-doc token count (per-batch partials -> one tiny groupby; the
  domain is bounded by max DOCUMENT length, not corpus size), the
  driver walks the CDF to pin the cutoff (index rule = DuckDB
  ``quantile_disc``, same as sketches.group_quantiles), and pass 2
  re-derives the count per batch and filters. No sort, no sampling.

All ratios are single exact IEEE divisions; every other value is
int64 — the cross-engine float discipline from CLAUDE.md.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_stats import TOKEN_PATTERN


def _token_lists(text_arr):
    """Nonempty-row mask + token ListArray for the nonempty rows, via
    the engine's ONE tokenizer scaffolding (dedup._tokenized_rows — the
    shared definition the dedup/oracle contract pins); tokens are
    maximal non-whitespace runs, identical to regexp_extract_all."""
    from .dedup import _tokenized_rows

    if isinstance(text_arr, pa.ChunkedArray):
        text_arr = text_arr.combine_chunks()
    nonempty = np.zeros(len(text_arr), dtype=bool)
    tr = _tokenized_rows(text_arr)
    if tr is None:
        return nonempty, None
    row_idx, toks = tr
    nonempty[row_idx] = True
    return nonempty, toks


# --- keyword search (broadcast terms, distributed top-k) -------------------


def keyword_search(
    ds,
    terms: tuple[str, ...],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-k documents by query-term hit count (tf summed over the
    query terms, whole-token matches). The BM25-family retrieval
    primitive reduced to its exactly-oracle-checkable integer core:
    score = number of token instances that are query terms; ranking is
    (score DESC, id ASC) with row_number semantics — ties at the k
    boundary resolve deterministically by id on both engines.

    Emits (id, score, rank) for the k best documents with score > 0.
    """
    term_arr = pa.array(sorted(set(terms)), pa.large_string())

    def score_partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        scores = np.zeros(len(ids), np.int64)
        nonempty, toks = _token_lists(t.column(text_col))
        if toks is not None:
            flat = toks.flatten().cast(pa.large_string())
            member = np.asarray(pc.is_in(flat, value_set=term_arr))
            per_sub = np.asarray(pc.list_value_length(toks), dtype=np.int64)
            row_of = np.repeat(np.arange(len(per_sub)), per_sub)
            scores[np.flatnonzero(nonempty)] = np.bincount(
                row_of[member], minlength=len(per_sub)
            )
        keep = scores > 0
        # per-block partial top-k: only k candidate rows leave the block
        order = np.lexsort((ids[keep], -scores[keep]))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[keep][order], pa.int64()),
                "score": pa.array(scores[keep][order], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        sc = np.asarray(t.column("score"), dtype=np.int64)
        real = sc > 0  # drop the schema-sentinel seed row
        ids, sc = ids[real], sc[real]
        order = np.lexsort((ids, -sc))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "score": pa.array(sc[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    import ray.data as rd

    # batch_size=None → whole-block batches, so the merge input really is
    # k × num_blocks rows as documented (ADVICE r4: the default ~1k-row
    # batches made it k × num_batches)
    partials = ds.map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    # a one-row sentinel seed block (score=0, filtered in merge): when
    # NO document scores — an ordinary outcome for selective terms —
    # every partial block is empty and Ray drops them ALL, so the merge
    # stage would never run and the result would lose its schema
    # entirely (Dataset.schema() → None); the sentinel guarantees the
    # merge runs and its (possibly 0-row) output block carries schema
    seed = rd.from_arrow(
        pa.table(
            {
                id_col: pa.array([-1], pa.int64()),
                "score": pa.array([0], pa.int64()),
            }
        )
    )
    # batch_size=None pins whole-block batching for the single merge
    # (same rationale as corpus.top_docs_per_group, ADVICE r3)
    return partials.union(seed).repartition(1).map_batches(
        merge, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# --- corpus-frequency rarity scoring ---------------------------------------

RARITY_VOCAB_K = 256


def rarity_score(
    ds,
    *,
    vocab_k: int = RARITY_VOCAB_K,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Two-pass corpus-frequency scoring — the cheap LM-quality proxy
    (documents whose tokens are mostly outside the corpus's common
    vocabulary are noise/boilerplate candidates; cf. the frequency
    filters in public C4/Gopher pipeline descriptions).

    Pass 1: global top-``vocab_k`` token frequencies (``vocab_topk``'s
    partial-count + coarse-partition shape). Pass 2: per batch, count
    how many of each document's token instances fall in that vocabulary
    and sum their corpus frequencies. Tokens outside the top-V
    contribute zero by definition (the cap IS the contract — the oracle
    replays it with the same (n DESC, token ASC) tie-break).

    Emits (id, n_tokens, n_common, freq_sum, common_ratio) per
    document; common_ratio = n_common / n_tokens is the single IEEE
    division (0.0 for empty documents).
    """
    import ray

    from .corpus import vocab_topk

    vt = vocab_topk(ds, k=vocab_k, text_col=text_col).to_pandas()
    vocab_arr = pa.array(vt["token"].tolist(), pa.large_string())
    freqs = vt["n"].to_numpy(dtype=np.int64)
    vt_ref = ray.put((vocab_arr, freqs))

    def score_batch(t: pa.Table) -> pa.Table:
        vocab, vfreq = ray.get(vt_ref)
        ids = t.column(id_col)
        n_rows = t.num_rows
        n_tokens = np.zeros(n_rows, np.int64)
        n_common = np.zeros(n_rows, np.int64)
        freq_sum = np.zeros(n_rows, np.int64)
        nonempty, toks = _token_lists(t.column(text_col))
        if toks is not None:
            sub_rows = np.flatnonzero(nonempty)
            flat = toks.flatten().cast(pa.large_string())
            idx = np.asarray(
                pc.index_in(flat, value_set=vocab).fill_null(-1), dtype=np.int64
            )
            hit = idx >= 0
            per_sub = np.asarray(pc.list_value_length(toks), dtype=np.int64)
            row_of = np.repeat(np.arange(len(per_sub)), per_sub)
            n_tokens[sub_rows] = per_sub
            n_common[sub_rows] = np.bincount(
                row_of[hit], minlength=len(per_sub)
            )
            fs = np.zeros(len(per_sub), np.int64)
            # int64 segment sum (bincount weights would round-trip
            # through float64 and lose exactness past 2^53)
            np.add.at(fs, row_of[hit], vfreq[idx[hit]])
            freq_sum[sub_rows] = fs
        ratio = np.divide(
            n_common,
            n_tokens.astype(np.float64),
            out=np.zeros(n_rows),
            where=n_tokens > 0,
        )
        return pa.table(
            {
                id_col: ids,
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_common": pa.array(n_common, pa.int64()),
                "freq_sum": pa.array(freq_sum, pa.int64()),
                "common_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# --- per-document tf-idf top terms ------------------------------------------

TFIDF_SCALE = 1_000_000


def tfidf_topterms(
    ds,
    *,
    vocab_k: int = RARITY_VOCAB_K,
    top_terms: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document keyword extraction: the ``top_terms`` best terms by
    an integer-exact tf·idf surrogate, score = (tf * 1_000_000) // df —
    tf/df ordering without a float log, so DuckDB replays it
    bit-for-bit with BIGINT // arithmetic.

    Candidate terms are the global top-``vocab_k`` vocabulary (the cap
    is the contract, same tie-break as rarity_score); df = exact
    document frequency of each candidate. Three passes, all narrow:

    1. ``vocab_topk`` (partial counts -> coarse partitions -> V rows);
    2. df: per-batch distinct (doc, term) membership counts reduce to a
       V-long partial vector per batch, one tiny groupby finishes it —
       the shuffle carries (term_idx, partial_df) pairs only;
    3. scoring: a pure per-batch map ranks each doc's candidate terms
       by (score DESC, token ASC) and keeps ``top_terms``.

    Emits (id, token, tf, df, score, rank); documents containing no
    vocabulary term emit no rows (the SQL join semantics).
    """
    import ray

    from .corpus import vocab_topk

    vt = vocab_topk(ds, k=vocab_k, text_col=text_col).to_pandas()
    vocab_tokens = vt["token"].tolist()
    vocab_arr = pa.array(vocab_tokens, pa.large_string())
    n_vocab = len(vocab_tokens)
    # rank of each vocab index in token string order (ASC tie-break)
    tok_rank = np.empty(n_vocab, np.int64)
    tok_rank[np.argsort(np.array(vocab_tokens, dtype=object))] = np.arange(n_vocab)
    vocab_ref = ray.put(vocab_arr)

    def _doc_term_pairs(t: pa.Table):
        """(row, vidx) pair keys + counts for vocab-term instances."""
        vocab = ray.get(vocab_ref)
        nonempty, toks = _token_lists(t.column(text_col))
        if toks is None:
            return None
        flat = toks.flatten().cast(pa.large_string())
        idx = np.asarray(
            pc.index_in(flat, value_set=vocab).fill_null(-1), dtype=np.int64
        )
        hit = idx >= 0
        per_sub = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        row_of = np.repeat(np.arange(len(per_sub)), per_sub)
        key = row_of[hit] * n_vocab + idx[hit]
        uk, tf = np.unique(key, return_counts=True)
        return nonempty, uk // n_vocab, uk % n_vocab, tf.astype(np.int64)

    def df_partial(t: pa.Table) -> pa.Table:
        pairs = _doc_term_pairs(t)
        if pairs is None:
            return pa.table(
                {"vidx": pa.array([], pa.int64()), "pdf": pa.array([], pa.int64())}
            )
        _, _, vidx, _ = pairs
        pdf = np.bincount(vidx, minlength=n_vocab)
        nz = np.flatnonzero(pdf)
        return pa.table(
            {
                "vidx": pa.array(nz, pa.int64()),
                "pdf": pa.array(pdf[nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vidx")
        .aggregate(Sum("pdf", alias_name="df"))
        .to_pandas()
    )
    df_vec = np.zeros(n_vocab, np.int64)
    df_vec[df_tbl["vidx"].to_numpy(dtype=np.int64)] = df_tbl["df"].to_numpy(
        dtype=np.int64
    )
    df_ref = ray.put(df_vec)

    def score_batch(t: pa.Table) -> pa.Table:
        dfv = ray.get(df_ref)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        pairs = _doc_term_pairs(t)
        if pairs is None:
            return empty
        nonempty, sub_row, vidx, tf = pairs
        if len(vidx) == 0:
            return empty
        ids = np.asarray(t.column(id_col), dtype=np.int64)[
            np.flatnonzero(nonempty)[sub_row]
        ]
        df_of = dfv[vidx]
        score = (tf * TFIDF_SCALE) // df_of
        # per-doc rank by (score DESC, token ASC): stable run detection
        order = np.lexsort((tok_rank[vidx], -score, ids))
        new = np.concatenate([[True], ids[order][1:] != ids[order][:-1]])
        pos = np.arange(len(order)) - np.maximum.accumulate(
            np.where(new, np.arange(len(order)), 0)
        )
        keep = order[pos < top_terms]
        rank = (pos[pos < top_terms] + 1).astype(np.int64)
        tokens = ray.get(vocab_ref).take(pa.array(vidx[keep], pa.int64()))
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "token": tokens.cast(pa.string()),
                "tf": pa.array(tf[keep], pa.int64()),
                "df": pa.array(df_of[keep], pa.int64()),
                "score": pa.array(score[keep], pa.int64()),
                "rank": pa.array(rank, pa.int64()),
            }
        )

    return ds.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# --- global-percentile filtering -------------------------------------------


def quantile_filter(
    ds,
    q: float = 0.25,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Keep documents whose token count is at or above the corpus-wide
    q-th discrete percentile — the global-threshold gate pattern
    (perplexity/length filtering against a corpus statistic rather than
    a fixed constant).

    Pass 1: exact global quantile via integer histogram partials (one
    (n_tokens -> count) groupby whose cardinality is bounded by the
    longest document, never by corpus size) and a driver CDF walk with
    the DuckDB ``quantile_disc`` index rule — element at
    max(0, ceil(q*n) - 1), the same double multiply as
    sketches.group_quantiles so both engines agree bit-for-bit.
    Pass 2: stateless per-batch re-count + filter against the broadcast
    scalar cutoff. Emits (id, n_tokens) for survivors.
    """
    from ray.data.aggregate import Sum

    def count_tokens(t: pa.Table):
        return pc.cast(
            pc.count_substring_regex(
                pc.coalesce(t.column(text_col), pa.scalar("", pa.string())),
                TOKEN_PATTERN,
            ),
            pa.int64(),
        )

    def hist_partial(t: pa.Table) -> pa.Table:
        h = pa.table({"n_tokens": count_tokens(t)})
        g = h.group_by(["n_tokens"]).aggregate([([], "count_all")])
        return g.rename_columns(["n_tokens", "n"])

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_tokens")
        .aggregate(Sum("n", alias_name="n_sum"))
        .to_pandas()
    )
    if "n_tokens" in hist.columns:
        vals = hist["n_tokens"].to_numpy(dtype=np.int64)
        counts = hist["n_sum"].to_numpy(dtype=np.int64)
    else:  # empty corpus: the 0-row aggregate loses its columns entirely
        vals = counts = np.empty(0, np.int64)
    if len(vals):
        order = np.argsort(vals)
        vals, counts = vals[order], counts[order]
        cum = np.cumsum(counts)
        n = int(cum[-1])
        idx = max(0, math.ceil(q * n) - 1)  # = DuckDB quantile_disc
        cutoff = int(vals[int(np.searchsorted(cum, idx + 1, side="left"))])
    else:
        # empty corpus: quantile_disc of an empty multiset is NULL and
        # `n_tokens >= NULL` keeps nothing — mirror with an empty result
        cutoff = None

    def filt(t: pa.Table) -> pa.Table:
        nt = count_tokens(t)
        if cutoff is None:
            keep = pa.array(np.zeros(t.num_rows, dtype=bool))
        else:
            keep = pc.greater_equal(nt, pa.scalar(cutoff, pa.int64()))
        return pa.table(
            {id_col: t.column(id_col), "n_tokens": nt}
        ).filter(keep)

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
