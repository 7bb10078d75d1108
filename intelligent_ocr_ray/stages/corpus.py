"""Corpus-preparation operators a training-data pipeline runs after
extraction: PII scrubbing, quality filtering, global vocabulary counts,
and token-window chunking. All vectorized Arrow kernels, all with exact
DuckDB oracle twins (__ray_entry__.py) — RE2 regex + single-space token
joins keep the two engines bit-identical.

Scale shapes:
* scrub / filter / chunk are pure per-batch maps — embarrassingly
  parallel, no shuffle;
* vocab_topk pre-counts tokens per batch (pyarrow group_by), shuffles
  only (token, partial_n) pairs hash-partitioned COARSELY, finishes
  each partition with one vectorized group_by + local top-k, and merges
  k × num_parts candidate rows — the partial-aggregate + coarse-
  partition discipline from the dedup pipelines (a per-token groupby
  would be millions of tiny groups; see ray-sandbox notes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_stats import (
    PUNCT_PATTERN,
    STOPWORD_PATTERN,
    TOKEN_PATTERN,
)

# RE2-safe patterns, identical strings on the DuckDB side.
EMAIL_PATTERN = r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+"
PHONE_PATTERN = r"\+?[0-9][0-9 ()-]{7,}[0-9]"

_WS = " \t\r\n"


def scrub_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails then phone-like digit runs (order matters and is
    part of the contract — the oracle applies the same two
    regexp_replace passes in the same order). Emits the scrubbed text
    plus per-kind redaction counts for lineage."""
    text = batch.column(text_col)
    n_email = pc.cast(pc.count_substring_regex(text, EMAIL_PATTERN), pa.int64())
    scrubbed = pc.replace_substring_regex(text, EMAIL_PATTERN, "<EMAIL>")
    n_phone = pc.cast(pc.count_substring_regex(scrubbed, PHONE_PATTERN), pa.int64())
    scrubbed = pc.replace_substring_regex(scrubbed, PHONE_PATTERN, "<PHONE>")
    out = batch.drop_columns([text_col])
    out = out.append_column("text_scrubbed", scrubbed)
    out = out.append_column("n_email", n_email)
    out = out.append_column("n_phone", n_phone)
    return out


def quality_filter_batch(
    batch: pa.Table,
    text_col: str = "text",
    *,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.1,
    min_stopword_ratio: float = 0.01,
) -> pa.Table:
    """Keep documents that pass the standard pretraining quality gates
    (enough tokens, not punctuation soup, some natural-language signal).
    Ratios use the exact double-division op order of quality_stats so
    the SQL twin filters identically."""
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_PATTERN), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_PATTERN), pa.float64())
    n_stop = pc.cast(pc.count_substring_regex(text, STOPWORD_PATTERN), pa.float64())
    safe = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_tok = pc.max_element_wise(n_tokens, pa.scalar(1.0))
    keep = pc.and_kleene(
        pc.greater_equal(n_tokens, pa.scalar(float(min_tokens))),
        pc.and_kleene(
            pc.less_equal(pc.divide(n_punct, safe), pa.scalar(max_punct_ratio)),
            pc.greater_equal(
                pc.divide(n_stop, safe_tok), pa.scalar(min_stopword_ratio)
            ),
        ),
    ).fill_null(False)
    out = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    return out.filter(keep)


# --- global vocabulary (top-k tokens) -------------------------------------


def _token_partial_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch combiner: explode tokens, count within the batch — the
    shuffle then carries (token, n) partials, never raw text."""
    trimmed = pc.utf8_trim(batch.column(text_col), _WS)
    nonempty = pc.greater(pc.utf8_length(trimmed).fill_null(0), 0)
    toks = pc.split_pattern_regex(trimmed.filter(nonempty), "[ \t\r\n]+")
    flat = pc.list_flatten(toks)
    t = pa.table({"token": flat})
    return pa.TableGroupBy(t, ["token"]).aggregate([([], "count_all")]).rename_columns(
        ["token", "n"]
    )


def _topk_in_partition(part: pa.Table, k: int) -> pa.Table:
    """Per-partition finish: tokens are hash-partitioned, so each
    token's count completes HERE — sum partials, keep the partition's
    top-k (n desc, token asc)."""
    g = (
        part.drop_columns(["vpart"])
        .group_by(["token"])
        .aggregate([("n", "sum")])
        .rename_columns(["token", "n"])
    )
    n = np.asarray(g.column("n"))
    tok = np.asarray(g.column("token").cast(pa.large_string()))
    order = np.lexsort((tok, -n))[:k]
    return g.take(pa.array(order))


def vocab_topk(ds, k: int = 100, *, text_col: str = "text", num_parts: int = 64):
    """Global top-k token frequencies: per-batch partial counts →
    coarse hash-partition of the token space → per-partition sum +
    local top-k → tiny global merge (k × num_parts rows). Exact, with
    the oracle's deterministic tie-break (n desc, token asc)."""
    import functools

    partials = ds.map_batches(
        functools.partial(_token_partial_counts, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def add_part(t: pa.Table) -> pa.Table:
        # vectorized deterministic token hash → coarse partition id
        # (pandas hash_array = siphash with a fixed key: C-speed and
        # process-independent, unlike builtin hash())
        import pandas as pd

        toks = np.asarray(t.column("token").cast(pa.large_string()), dtype=object)
        part = (pd.util.hash_array(toks) % num_parts).astype(np.int32)
        return t.append_column("vpart", pa.array(part, pa.int32()))

    parted = partials.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    cand = parted.groupby("vpart").map_groups(
        functools.partial(_topk_in_partition, k=k), batch_format="pyarrow"
    )
    return cand.sort(["n", "token"], descending=[True, False]).limit(k)


# --- token-window chunking ------------------------------------------------


def chunk_tokens_batch(
    batch: pa.Table,
    chunk_size: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Split each document into consecutive windows of ``chunk_size``
    tokens (the standard pretraining-example chunker); chunk text is the
    single-space join of its tokens (a defined re-serialization, so the
    SQL twin reproduces it exactly). Fully vectorized: regex split →
    offset arithmetic → one ListArray re-slice → binary_join. Zero-token
    documents emit no chunks."""
    ids = batch.column(id_col)
    trimmed = pc.utf8_trim(batch.column(text_col), _WS)
    nonempty = np.asarray(pc.greater(pc.utf8_length(trimmed).fill_null(0), 0))
    keep_ids = ids.filter(pa.array(nonempty))
    toks = pc.split_pattern_regex(trimmed.filter(pa.array(nonempty)), "[ \t\r\n]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    n_tok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    n_chunks = (n_tok + chunk_size - 1) // chunk_size
    # chunk offsets tile each doc's token range exactly (no overlap), so
    # the flattened token values can be re-sliced with new offsets only.
    # Fully vectorized: chunk j of doc i ends at
    # min(doc_start_i + (j+1)·size, doc_end_i).
    doc_starts = np.concatenate([[0], np.cumsum(n_tok)])
    total = int(n_chunks.sum())
    doc_of_chunk = np.repeat(np.arange(len(n_tok)), n_chunks)
    chunk_idx = (
        np.arange(total) - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    ).astype(np.int64)
    ends = np.minimum(
        doc_starts[doc_of_chunk] + (chunk_idx + 1) * chunk_size,
        doc_starts[doc_of_chunk + 1],
    )
    chunk_list = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], ends]), pa.int32()), flat
    )
    chunk_text = pc.binary_join(chunk_list, " ")
    out_ids = np.asarray(keep_ids).repeat(n_chunks)
    return pa.table(
        {
            id_col: pa.array(out_ids, ids.type),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_chunk_tokens": pc.cast(pc.list_value_length(chunk_list), pa.int64()),
            "chunk_text": chunk_text,
        }
    )
