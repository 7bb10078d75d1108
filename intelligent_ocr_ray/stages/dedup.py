"""Near-duplicate detection + similarity search over document text and
embeddings — the training-data-pipeline operators layered on top of the
reference's exact-dedup semantics (its done-set identity dedup,
core/checkpoint.py:37-41 / SURVEY.md §2.7 D1, generalized to content
similarity).

Operators (each = one `queries()` entry in __ray_entry__.py):

* exact n-gram Jaccard pairs  — inverted-index (gram groupby) join;
  exact ground truth, DuckDB-oracled.
* MinHash + LSH               — shingle → 64-perm minhash → 16 bands × 4
  rows → band-bucket groupby → in-bucket estimated Jaccard.
* SimHash                     — 64-bit sign-of-weighted-bit-sum over
  token hashes; 4 × 16-bit band bucketing; Hamming ≤ k pairs.
* embedding cosine near-dup   — all-pairs cosine ≥ τ via broadcast
  normalized matrix (scale path: LSH/IVF bucketing below).
* ANN top-k                   — brute-force cosine top-k per query
  vector (broadcast query matrix, per-batch partial top-k, tiny final
  reduce); IVF-bucketed variant as the 100-TB path.

Shuffle discipline: every operator pre-reduces inside `map_batches`
(distinct grams per doc, per-batch partial top-k) before its one
`groupby`; small sides (query matrix, hyperplanes, centroids) are
broadcast via `ray.put`, never shuffled.

Determinism: all hashing is blake2b / seeded-numpy — never builtin
`hash()` (process-salted). Cross-engine float parity notes inline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_stats import TOKEN_PATTERN

import re as _re

_TOKEN_RE = _re.compile(TOKEN_PATTERN)

# --- shingling ------------------------------------------------------------

NGRAM_N = 3


def word_ngrams(text: str, n: int = NGRAM_N) -> set[str]:
    """Distinct word n-grams (space-joined). Tokens = TOKEN_PATTERN runs,
    identical to the oracle SQL's string_split semantics on this corpus."""
    toks = _TOKEN_RE.findall(text or "")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _md5_low64(data: bytes) -> int:
    """64-bit hash equal to DuckDB's ``md5_number_lower`` (measured:
    digest bytes [8:16] little-endian) — the cross-engine hash used
    wherever an oracle must reproduce hash arithmetic bit-for-bit
    (minhash, simhash, fingerprint; same discipline as the KMV
    sketch's md5 bottom-k)."""
    return int.from_bytes(hashlib.md5(data).digest()[8:16], "little")


def _md5_hash_strings(
    arr: pa.Array | pa.ChunkedArray, *, bits: int = 64, encoded: bool = False
) -> "np.ndarray | tuple[np.ndarray, np.ndarray]":
    """``md5_number_lower`` per string of an Arrow string array →
    uint64 (optionally masked to the low 32 bits). The vectorized form
    of ``_md5_low64`` over a column: values are dictionary-encoded
    first so each DISTINCT string in the batch is digested exactly
    once (grams/tokens repeat heavily across documents in any
    duplicate-bearing corpus), and the digests read straight from the
    dictionary's Arrow buffers (offsets + memoryview slices — the
    ``add_content_hash`` technique; no Python str materialization, no
    re-encode). Nulls are not supported — callers feed gram/token
    arrays that are non-null by construction.

    With ``encoded=True`` the dictionary form ``(uniq_hashes, idx)``
    is returned instead of the expanded ``uniq_hashes[idx]`` — callers
    that do per-hash arithmetic (minhash permutations) apply it to the
    (much smaller) distinct set and gather, a ~5× win measured on
    corpus-shaped batches (27k distinct of 260k gram occurrences)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not len(arr):
        e = np.empty(0, dtype=np.uint64)
        return (e, np.empty(0, dtype=np.int64)) if encoded else e
    dd = arr.dictionary_encode()
    dic = dd.dictionary
    idx = np.asarray(dd.indices, dtype=np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(dic.type) else np.int32
    bufs = dic.buffers()
    offsets = np.frombuffer(
        bufs[1],
        dtype=off_dtype,
        count=len(dic) + 1,
        offset=dic.offset * np.dtype(off_dtype).itemsize,
    )
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    from_bytes = int.from_bytes
    uniq = np.fromiter(
        (
            from_bytes(md5(data[s:e]).digest()[8:16], "little")
            for s, e in zip(offsets[:-1], offsets[1:])
        ),
        dtype=np.uint64,
        count=len(dic),
    )
    if bits == 32:
        uniq &= np.uint64(0xFFFFFFFF)
    if encoded:
        return uniq, idx
    return uniq[idx]


def _tokenized_rows(
    col: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, pa.Array] | None:
    """Shared scaffolding of the gram/token producers: trim →
    non-blank row mask → whitespace tokenize. Returns (row_idx, toks
    list-array) or None when no row survives — ONE definition so the
    minhash and simhash paths can never diverge from each other (or
    from their scalar oracle twins) on the tokenizer contract."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not len(col):
        return None
    trimmed = pc.utf8_trim(col, " \t\r\n")
    ok = np.asarray(
        pc.and_kleene(
            pc.is_valid(trimmed), pc.greater(pc.utf8_length(trimmed), 0)
        ).fill_null(False)
    )
    row_idx = np.flatnonzero(ok)
    if not len(row_idx):
        return None
    toks = pc.split_pattern_regex(trimmed.take(pa.array(row_idx)), "[ \t\r\n]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return row_idx, toks


def _sorted_row_segments(pairs: pa.Table, value_col: str):
    """Order a per-(row, value) table by row and delimit the per-row
    segments: (rows, values, order, starts) — the other half of the
    shared segment contract."""
    order = pc.sort_indices(pairs.column("row"))
    rows = np.asarray(pairs.column("row").take(order), dtype=np.int64)
    vals = pairs.column(value_col).take(order)
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    seg_new = np.concatenate([[True], rows[1:] != rows[:-1]])
    starts = np.concatenate([np.flatnonzero(seg_new), [len(rows)]]).astype(np.int64)
    return rows, vals, order, starts


def _distinct_gram_rows(
    col: pa.Array | pa.ChunkedArray, n: int
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Vectorized batch-level ``word_ngrams``: distinct word n-grams per
    row, as (rows, grams, starts) where ``rows`` (int64, ascending) maps
    each output entry to its input row, ``grams`` is the aligned gram
    string array (single-space joins of TOKEN_PATTERN runs — identical
    strings to the scalar path and to the oracle SQL), and ``starts``
    delimits per-row segments in both (len = #rows-with-grams + 1).
    Rows that produce no grams (null / whitespace-only / < n tokens)
    simply have no segment — callers supply their sentinel.

    This is the shared shingle producer for minhash / decontaminate /
    explode_grams (VERDICT r3 #1): Arrow regex split → shifted takes →
    binary_join_element_wise → one C++ group_by distinct — no per-row
    Python, no Python string sets."""
    empty = (
        np.empty(0, dtype=np.int64),
        pa.array([], pa.string()),
        np.zeros(1, dtype=np.int64),
    )
    tr = _tokenized_rows(col)
    if tr is None:
        return empty
    row_idx, toks = tr
    flat = toks.flatten()
    n_tok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    n_gram = np.maximum(n_tok - (n - 1), 0)
    total = int(n_gram.sum())
    if not total:
        return empty
    doc_starts = np.concatenate([[0], np.cumsum(n_tok)])[:-1]
    base = np.repeat(doc_starts, n_gram) + (
        np.arange(total) - np.repeat(np.cumsum(n_gram) - n_gram, n_gram)
    )
    parts = [flat.take(pa.array(base + k)) for k in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ") if n > 1 else parts[0]
    pairs = (
        pa.table(
            {
                "row": pa.array(np.repeat(row_idx, n_gram), pa.int64()),
                "gram": grams,
            }
        )
        .group_by(["row", "gram"])
        .aggregate([])
    )
    rows, gr, _, starts = _sorted_row_segments(pairs, "gram")
    return rows, gr, starts


def _token_count_rows(
    col: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """Vectorized per-row token frequencies: (rows, tokens, counts,
    starts) with the same segment contract as ``_distinct_gram_rows``
    — the batch-level form of simhash64's token-frequency dict."""
    empty = (
        np.empty(0, dtype=np.int64),
        pa.array([], pa.string()),
        np.empty(0, dtype=np.int64),
        np.zeros(1, dtype=np.int64),
    )
    tr = _tokenized_rows(col)
    if tr is None:
        return empty
    row_idx, toks = tr
    n_tok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    pairs = (
        pa.table(
            {
                "row": pa.array(np.repeat(row_idx, n_tok), pa.int64()),
                "token": toks.flatten(),
            }
        )
        .group_by(["row", "token"])
        .aggregate([([], "count_all")])
    )
    rows, tok, order, starts = _sorted_row_segments(pairs, "token")
    counts = np.asarray(pairs.column("count_all").take(order), dtype=np.int64)
    return rows, tok, counts, starts


def _segment_chunks(starts: np.ndarray, chunk: int):
    """Yield (i, j) segment-index ranges whose combined element count is
    ~<= chunk (always >= 1 segment) — bounds the working-set of the
    chunked reduceat passes below regardless of batch size."""
    n_seg = len(starts) - 1
    i = 0
    while i < n_seg:
        j = int(np.searchsorted(starts, starts[i] + chunk, side="right")) - 1
        j = min(max(j, i + 1), n_seg)
        yield i, j
        i = j


# --- exact n-gram Jaccard (inverted index) --------------------------------


def explode_grams(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text", n: int = NGRAM_N
) -> pa.Table:
    """One row per (doc, distinct gram), carrying the doc's distinct-gram
    count so downstream pair aggregation never needs a per-doc lookup
    table (no broadcast of an O(corpus) side).

    Grams are keyed by their stable 64-bit hash, not the string: the
    groupby shuffle then moves fixed-width ints (measured ~5× faster
    than string keys at sf0.1). Collision risk ~n²/2⁶⁴ — ≈1e-7 at a
    million distinct grams — is far below the estimator noise of any
    downstream use; flip to the string key if bit-exactness vs a
    string-grouped oracle is ever violated.

    Fully vectorized via the shared ``_distinct_gram_rows`` producer
    (Arrow regex token split → shifted takes → binary_join_element_wise
    → C++ group_by distinct), then one deterministic pd.util.hash_array
    pass over the distinct grams (the vocab partitioner's hashing
    discipline) — no per-row Python, no per-gram digest calls."""
    import pandas as _pd

    rows, grams, starts = _distinct_gram_rows(batch.column(text_col), n)
    if not len(rows):
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "gram": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
            }
        )
    ids = np.asarray(batch.column(id_col), dtype=np.int64)
    hashes = _pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.int64)
    # distinct-gram count per doc, aligned to the (already row-sorted)
    # segment layout
    counts = np.diff(starts)
    per_row_n = np.repeat(counts, counts)
    return pa.table(
        {
            "doc_id": pa.array(ids[rows], pa.int64()),
            "gram": pa.array(hashes, pa.int64()),
            "n_grams": pa.array(per_row_n, pa.int64()),
        }
    )


def _pairs_from_gram_partition(part: pa.Table, max_df: int) -> pa.Table:
    """All ordered doc pairs per shared gram, for one HASH PARTITION of
    the gram space (gram-major groups found vectorized — one Python call
    per ~10⁴-row partition, not per gram: per-group map_groups costs
    ~30 µs of dispatch × millions of mostly-singleton grams, which
    measured 10× slower than the whole rest of the pipeline).

    Hot grams (document frequency > max_df — boilerplate shingles) are
    dropped, the standard df-cap bounding the quadratic blowup; the
    oracle SQL applies the identical cap so results stay comparable."""
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "na": pa.array([], pa.int64()),
            "nb": pa.array([], pa.int64()),
        }
    )
    if part.num_rows < 2:
        return empty
    order = pc.sort_indices(
        part, sort_keys=[("gram", "ascending"), ("doc_id", "ascending")]
    )
    grams = np.asarray(part.column("gram").take(order))
    ids = np.asarray(part.column("doc_id").take(order))
    ns = np.asarray(part.column("n_grams").take(order))
    starts = np.concatenate([[0], np.flatnonzero(grams[1:] != grams[:-1]) + 1, [len(grams)]])
    sizes = np.diff(starts)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_na: list[np.ndarray] = []
    out_nb: list[np.ndarray] = []
    for gi in np.flatnonzero((sizes >= 2) & (sizes <= max_df)):
        lo, m = starts[gi], sizes[gi]
        ai, bi = np.triu_indices(m, k=1)
        out_a.append(ids[lo + ai])
        out_b.append(ids[lo + bi])
        out_na.append(ns[lo + ai])
        out_nb.append(ns[lo + bi])
    if not out_a:
        return empty
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            "na": pa.array(np.concatenate(out_na), pa.int64()),
            "nb": pa.array(np.concatenate(out_nb), pa.int64()),
        }
    )


def ngram_jaccard_pairs(ds, threshold: float = 0.5, max_df: int = 100, num_parts: int = 64):
    """Exact Jaccard-similar pairs via inverted index: explode distinct
    grams → hash-partition the GRAM SPACE (coarse, num_parts) → per-
    partition vectorized pair emission → groupby(pair) count =
    |intersection| → J = inter / (na + nb - inter) → filter ≥ τ.

    jaccard is one IEEE double division of exact ints — bit-identical
    across engines, safe for value hashing."""
    import functools

    from ray.data.aggregate import Count, Max

    grams = ds.map_batches(explode_grams, batch_format="pyarrow", zero_copy_batch=True)

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t.column("gram"), np.int64(num_parts - 1)), pa.int32()
        )
        return t.append_column("part", part)

    parted = grams.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    pairs = parted.groupby("part").map_groups(
        functools.partial(_pairs_from_gram_partition, max_df=max_df),
        batch_format="pyarrow",
    )

    # Pair combine, same coarse-partition discipline: Ray's multi-key
    # sort-aggregate measured ~5k rows/s/core on the raw pair stream —
    # 40× the cost of everything else combined. Instead hash-partition
    # pairs coarsely and run pyarrow's C++ group_by inside each
    # partition (one Python call per partition, exact same result).
    def add_pair_part(t: pa.Table) -> pa.Table:
        # bit ops only: checked arithmetic would overflow on 2^31+ ids
        mixed = pc.bit_wise_xor(
            t.column("doc_a"), pc.shift_left(t.column("doc_b"), 17)
        )
        part = pc.cast(pc.bit_wise_and(mixed, np.int64(num_parts - 1)), pa.int32())
        return t.append_column("ppart", part)

    def combine_partition(part_t: pa.Table) -> pa.Table:
        g = part_t.group_by(["doc_a", "doc_b"]).aggregate(
            [([], "count_all"), ("na", "max"), ("nb", "max")]
        )
        inter = pc.cast(g.column("count_all"), pa.float64())
        union = pc.cast(
            pc.subtract(pc.add(g.column("na_max"), g.column("nb_max")), g.column("count_all")),
            pa.float64(),
        )
        j = pc.divide(inter, union)
        keep = pc.greater_equal(j, threshold)
        return pa.table(
            {
                "doc_a": g.column("doc_a").filter(keep),
                "doc_b": g.column("doc_b").filter(keep),
                "jaccard": j.filter(keep),
            }
        )

    pp = pairs.map_batches(add_pair_part, batch_format="pyarrow", zero_copy_batch=True)
    return pp.groupby("ppart").map_groups(combine_partition, batch_format="pyarrow")


# --- exact dedup (content-hash keyed) -------------------------------------


# Group key for null-text rows: distinct from every real digest (md5
# hex is always 32 chars) so NULL never merges with the empty string —
# the oracle mirrors with CASE WHEN text IS NULL THEN 'null' ELSE
# md5(text) END.
NULL_CONTENT_KEY = "null"


def add_content_hash(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Project a batch to (id, content_hash): a 32-hex md5 digest of the
    utf-8 text. The digest — not the text — is the downstream group key,
    so the dedup shuffle moves 32 fixed bytes per row instead of the
    whole corpus' payloads (the reference's done-set identity dedup,
    core/checkpoint.py:37-41, hashes for the same reason). md5 (not
    blake2b like the similarity hashes) because DuckDB's md5() lets the
    oracle SQL reproduce the key verbatim; collision probability
    ~n²/2¹²⁸ is negligible at any corpus size we'd meet.

    The digest is computed straight from the Arrow string buffers
    (offsets + memoryview slices of the utf-8 data) — no Python str
    materialization, no re-encode; measured ~2× over the to_pylist()
    form. Null text hashes to the NULL_CONTENT_KEY sentinel, which no
    real digest can collide with, so NULL and '' stay distinct groups
    (ADVICE r2)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = col.buffers()
    n = len(col)
    offsets = np.frombuffer(
        bufs[1], dtype=off_dtype, count=n + 1, offset=col.offset * np.dtype(off_dtype).itemsize
    )
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    if col.null_count:
        valid = np.asarray(pc.is_valid(col))
        digests = [
            md5(data[offsets[i] : offsets[i + 1]]).hexdigest()
            if valid[i]
            else NULL_CONTENT_KEY
            for i in range(n)
        ]
    else:
        digests = [
            md5(data[s:e]).hexdigest() for s, e in zip(offsets[:-1], offsets[1:])
        ]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "content_hash": pa.array(digests, pa.string()),
        }
    )


def exact_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Exact duplicate removal: one representative (min id) per distinct
    text, keyed by per-batch content hash. Scale shape: the map stage
    reduces each row to (id, digest) before the one hash-shuffle; raw
    text never leaves the read stage."""
    import functools

    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        functools.partial(add_content_hash, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))


# --- MinHash + LSH --------------------------------------------------------

N_PERM = 64
BAND_R = 4
N_BANDS = N_PERM // BAND_R  # 16

# 32-bit minhash value space: every quantity in the pipeline stays
# < 2^64 before any modulo, so numpy uint64 computes it EXACTLY and
# DuckDB HUGEINT reproduces it — that is what lets the driver hold
# minhash_dups to a cell-for-cell SQL oracle instead of rows-only.
MINHASH_MOD = 1 << 32  # slot values in [0, 2^32)
MINHASH_EMPTY = MINHASH_MOD - 1  # sentinel signature for gramless docs
BAND_KEY_MOD = (1 << 61) - 1  # Mersenne; 8·(MOD-1) < 2^64 (no overflow)
BAND_KEY_MUL = 7  # pair-mix multiplier (collisions only add candidates)


def _gram_hashes32(grams: set[str]) -> np.ndarray:
    """32-bit md5-derived hash per shingle (uint64 array, values < 2^32):
    md5_number_lower(gram) % 2^32, the form DuckDB reproduces verbatim."""
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = _md5_low64(g.encode("utf-8")) & 0xFFFFFFFF
    return out


def band_keys(sigs: np.ndarray) -> np.ndarray:
    """(n, N_PERM) signatures → (n, N_BANDS) int64 band keys, fully
    vectorized: the 4 slot values of a band (each < 2^32) pack into two
    uint64 words, then mix as ((k12 % M)·7 + (k34 % M)) % M with
    M = 2^61-1 — every intermediate < 2^64, so numpy uint64 is exact
    and the oracle's HUGEINT arithmetic matches bit-for-bit. A key
    collision between distinct bands only ADDS a candidate pair (est
    is computed from full signatures), identically on both engines."""
    v = sigs.reshape(-1, N_BANDS, BAND_R)
    k12 = (v[..., 0] << np.uint64(32)) | v[..., 1]
    k34 = (v[..., 2] << np.uint64(32)) | v[..., 3]
    m = np.uint64(BAND_KEY_MOD)
    key = ((k12 % m) * np.uint64(BAND_KEY_MUL) + (k34 % m)) % m
    return key.astype(np.int64)


class MinHashLSH:
    """Actor-pool stage: per doc, a 64-permutation minhash signature and
    its 16 LSH band keys (r=4), exploded to one row per (doc, band).

    Permutations (a·g + b) mod 2^32 over 32-bit md5 gram hashes
    (seeded, built once per actor); a odd, a·g + b < 2^64 so uint64 is
    exact — deterministic AND DuckDB-reproducible (the minhash_dups
    oracle replays the identical arithmetic in SQL). The full signature
    rides along on each band row so the band-bucket groupby can
    estimate Jaccard *inside the group* without a second signature
    join — 16× signature duplication (≈8 KB/doc) traded for one fewer
    shuffle; at 100 TB flip to bucket→candidate-ids→hash-join-
    signatures if payload amplification dominates."""

    def __init__(self, n: int = NGRAM_N, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = (
            rng.randint(1, 1 << 31, size=N_PERM).astype(np.uint64) * np.uint64(2)
            + np.uint64(1)
        )  # odd multipliers < 2^32
        self.b = rng.randint(0, 1 << 31, size=N_PERM).astype(np.uint64)
        self.n = n

    def signature(self, grams: set[str]) -> np.ndarray:
        """Scalar reference form (kept as the parity-test twin of the
        vectorized batch path below — tests assert bit-equality)."""
        if not grams:
            return np.full(N_PERM, MINHASH_EMPTY, dtype=np.uint64)
        base = _gram_hashes32(grams)  # (G,) values < 2^32
        # a·g ≤ (2^32-1)² and +b < 2^64: exact in uint64, no wraparound
        m = (self.a[:, None] * base[None, :] + self.b[:, None]) & np.uint64(
            0xFFFFFFFF
        )  # (P, G)
        return m.min(axis=1)

    def _sigs_from_segments(
        self, uniq: np.ndarray, idx: np.ndarray, starts: np.ndarray
    ) -> np.ndarray:
        """Dictionary-encoded gram hashes (``uniq`` distinct values,
        ``idx`` per-occurrence indices in row-segment layout) →
        (n_segs, N_PERM) signatures. The permutation products are
        computed ONCE per distinct gram — (U, 64), typically ~10× fewer
        rows than occurrences — then gathered per occurrence in bounded
        chunks (≤ ~2^18 grams × 64 perms ≈ 128 MB working set) with one
        ``np.minimum.reduceat`` (axis 0, contiguous segments) per chunk.
        Arithmetic identical to ``signature()``; the distinct-first +
        axis-0 layout measured 5× faster than a per-occurrence axis-1
        pass on corpus-shaped batches."""
        n_segs = len(starts) - 1
        sigs = np.empty((n_segs, N_PERM), dtype=np.uint64)
        mask = np.uint64(0xFFFFFFFF)
        md = (uniq[:, None] * self.a[None, :] + self.b[None, :]) & mask
        for i, j in _segment_chunks(starts, 1 << 16):
            lo, hi = starts[i], starts[j]
            sigs[i:j] = np.minimum.reduceat(md[idx[lo:hi]], starts[i:j] - lo, axis=0)
        return sigs

    def sig_matrix(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized batch signatures (VERDICT r3 #1): grams from the
        shared Arrow producer, each distinct gram string in the batch
        digested ONCE straight from the dictionary buffers — no Python
        string sets, no per-row md5 loops. Gramless rows (null / blank /
        < n tokens) keep the MINHASH_EMPTY sentinel signature, exactly
        as the scalar path. Returns (ids int64 (n,), sigs uint64
        (n, N_PERM))."""
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        n = len(ids)
        sigs = np.full((n, N_PERM), MINHASH_EMPTY, dtype=np.uint64)
        rows, grams, starts = _distinct_gram_rows(batch.column("text"), self.n)
        if len(rows):
            uniq, idx = _md5_hash_strings(grams, bits=32, encoded=True)
            sigs[rows[starts[:-1]]] = self._sigs_from_segments(uniq, idx, starts)
        return ids, sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Narrow per-doc signature table: (doc_id, sig32) with the 64
        uint32 slots stored as a fixed_size_list<int32, 64> — a
        zero-copy uint32→int32 VIEW (equality-preserving bijection; est
        only ever tests slot equality), 256 B/doc instead of the 512 B
        an int64 layout costs. Band rows are derived DOWNSTREAM from
        this table (`_explode_band_rows`) so the LSH bucket shuffle
        moves 20 B/band-row instead of 8.5 KB/doc of riding signatures
        (VERDICT r4 #3: the 1M-doc band exchange was the one unproven
        scale point)."""
        ids, sigs = self.sig_matrix(batch)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(
                sigs.astype(np.uint32).reshape(-1).view(np.int32), pa.int32()
            ),
            N_PERM,
        )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "sig32": sig_col}
        )


def _explode_band_rows(t: pa.Table) -> pa.Table:
    """(doc_id, sig32) per-doc table → (doc_id, band_idx, band_key)
    band rows, 20 B each — the ONLY payload the LSH bucket shuffle
    moves (the signatures stay in the narrow materialized sig table and
    are re-attached to the few candidate pairs afterwards)."""
    ids = np.asarray(t.column("doc_id"), dtype=np.int64)
    n = len(ids)
    sig_arr = t.column("sig32")
    if isinstance(sig_arr, pa.ChunkedArray):
        sig_arr = sig_arr.combine_chunks()
    sigs = (
        np.asarray(sig_arr.flatten())
        .view(np.uint32)
        .astype(np.uint64)
        .reshape(n, N_PERM)
    )
    keys = band_keys(sigs)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, N_BANDS), pa.int64()),
            "band_idx": pa.array(
                np.tile(np.arange(N_BANDS, dtype=np.int32), n), pa.int32()
            ),
            "band_key": pa.array(keys.reshape(-1), pa.int64()),
        }
    )


_EMPTY_PAIRS = {
    "doc_a": pa.array([], pa.int64()),
    "doc_b": pa.array([], pa.int64()),
}


def _cand_pairs_from_band_partition(part: pa.Table, max_bucket: int) -> pa.Table:
    """Candidate (doc_a, doc_b) pairs for one hash partition of the LSH
    bucket space (buckets = (band_idx, band_key) runs found vectorized —
    per-bucket map_groups dispatch costs more than all the math; see the
    n-gram pipeline note). No signatures ride along — est_jaccard is
    computed after the per-doc_a dedup, so the same pair surfacing from
    k colliding bands costs k narrow rows here, not k est computations.
    Oversized buckets (degenerate boilerplate collisions, incl. the
    shared MINHASH_EMPTY sentinel bucket) are capped — the skew guard."""
    if part.num_rows < 2:
        return pa.table(_EMPTY_PAIRS)
    order = pc.sort_indices(
        part,
        sort_keys=[
            ("band_idx", "ascending"),
            ("band_key", "ascending"),
            ("doc_id", "ascending"),
        ],
    )
    bidx = np.asarray(part.column("band_idx").take(order))
    bkey = np.asarray(part.column("band_key").take(order))
    ids = np.asarray(part.column("doc_id").take(order))
    newgrp = (bidx[1:] != bidx[:-1]) | (bkey[1:] != bkey[:-1])
    starts = np.concatenate([[0], np.flatnonzero(newgrp) + 1, [len(ids)]])
    sizes = np.diff(starts)
    AI: list[np.ndarray] = []
    BI: list[np.ndarray] = []
    for gi in np.flatnonzero((sizes >= 2) & (sizes <= max_bucket)):
        lo, m = starts[gi], sizes[gi]
        ai, bi = np.triu_indices(m, k=1)
        AI.append(lo + ai)
        BI.append(lo + bi)
    if not AI:
        return pa.table(_EMPTY_PAIRS)
    ai = np.concatenate(AI)
    bi = np.concatenate(BI)
    keep = ids[ai] != ids[bi]  # drop self-pairs from duplicate doc_ids
    ai, bi = ai[keep], bi[keep]
    return pa.table(
        {
            "doc_a": pa.array(ids[ai], pa.int64()),
            "doc_b": pa.array(ids[bi], pa.int64()),
        }
    )


# Below this doc count the full signature matrix (256 B/doc → ≤128 MB)
# is broadcast via ray.put and est_jaccard is scored INSIDE the band
# partition task — two exchanges total (band groupby + a tiny
# est-filtered pair dedup) instead of the attach path's three sorts,
# whose fixed scheduling floors dominate at small scale (measured:
# 1.32 s vs the 0.77 s r4 record at sf0.1's 5k docs). Above it the
# narrow two-pass attach exchange takes over: nothing broadcast scales
# with the corpus (the decontaminate/window_dedup crossover
# discipline). Semantics are identical by construction: same candidate
# buckets, same est arithmetic, same any-uncapped-bucket pair set.
MINHASH_BROADCAST_MAX_DOCS = 500_000

_SIG_BCAST_CACHE: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _bcast_sigs(sig_ref) -> tuple[np.ndarray, np.ndarray]:
    """Once-per-worker resolve of the broadcast (sorted doc_ids, uint64
    sig matrix) — ray.get from local plasma is zero-copy for numpy
    payloads; the cache skips even that per map_groups call."""
    key = sig_ref.hex()
    hit = _SIG_BCAST_CACHE.get(key)
    if hit is None:
        import ray

        hit = ray.get(sig_ref)
        _SIG_BCAST_CACHE.clear()
        _SIG_BCAST_CACHE[key] = hit
    return hit


def _gather_sig_matrix(sigs) -> tuple[np.ndarray, np.ndarray]:
    """Materialized narrow sig Dataset → (doc_ids sorted, (n, N_PERM)
    uint64 matrix) on the driver. Only ever called below the broadcast
    crossover (≤ MINHASH_BROADCAST_MAX_DOCS × 256 B ≈ 128 MB) — the
    bounded-side exception to the no-driver-materialization rule."""
    import ray

    tables = [t for t in ray.get(sigs.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.empty(0, np.int64), np.empty((0, N_PERM), np.uint64)
    t = pa.concat_tables(tables).combine_chunks()
    ids = np.asarray(t.column("doc_id"), dtype=np.int64)
    col = t.column("sig32")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mat = (
        np.asarray(col.flatten())
        .view(np.uint32)
        .astype(np.uint64)
        .reshape(len(ids), N_PERM)
    )
    o = np.argsort(ids, kind="stable")
    return ids[o], mat[o]


_EMPTY_SCORED = {
    "doc_a": pa.array([], pa.int64()),
    "doc_b": pa.array([], pa.int64()),
    "est_jaccard": pa.array([], pa.float64()),
}


def _scored_pairs_from_band_partition(
    part: pa.Table, *, max_bucket: int, threshold: float, sig_ref
) -> pa.Table:
    """Broadcast-path partition task: candidate pairs + est_jaccard in
    one pass, signatures gathered from the plasma-broadcast matrix.
    Copies of the same pair in OTHER partitions still exist (one per
    colliding band) — the tiny est-filtered pair groupby downstream
    dedups, exactly the r4 Max-agg semantic."""
    cand = _cand_pairs_from_band_partition(part, max_bucket)
    if not cand.num_rows:
        return pa.table(_EMPTY_SCORED)
    a = np.asarray(cand.column("doc_a"), dtype=np.int64)
    b = np.asarray(cand.column("doc_b"), dtype=np.int64)
    # local copy-dedup first: the same pair surfacing from two bands
    # co-located in THIS partition scores once, not twice
    o = np.lexsort((b, a))
    a, b = a[o], b[o]
    first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    a, b = a[first], b[first]
    ids_s, mat = _bcast_sigs(sig_ref)
    est = (mat[np.searchsorted(ids_s, a)] == mat[np.searchsorted(ids_s, b)]).mean(
        axis=1
    )
    keep = est >= threshold
    if not keep.any():
        return pa.table(_EMPTY_SCORED)
    return pa.table(
        {
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "est_jaccard": pa.array(est[keep], pa.float64()),
        }
    )


# per-worker-process MinHashLSH cache for the stateless-task path (the
# permutation table is cheap to build but free to reuse) — same pattern
# as stages/extractor._PROCESS_EXTRACTORS
_MINHASH_CACHE: dict[tuple[int, int], MinHashLSH] = {}


def minhash_batch(batch: pa.Table, n: int = NGRAM_N, seed: int = 7) -> pa.Table:
    mh = _MINHASH_CACHE.get((n, seed))
    if mh is None:
        mh = _MINHASH_CACHE[(n, seed)] = MinHashLSH(n, seed)
    return mh(batch)


def _band_partition_count(n_band_rows: int, *, rows_per_part: int = 100_000) -> int:
    """Power-of-two LSH bucket-space partition count sized from the
    band-row count (~100k band rows ≈ 50 MB with the riding signature
    per partition), clamped to [8, 65536] — the suggest_layout
    discipline applied to the banding shuffle. A fixed 64 was measured
    paying ~0.2 s of near-empty-partition overhead on a 5k-doc corpus
    while under-splitting a 100M-doc one."""
    target = max(1, n_band_rows // rows_per_part)
    return max(8, min(65536, 1 << (target - 1).bit_length()))


def _doc_part_ids(ids: np.ndarray, num_parts: int) -> np.ndarray:
    """Multiplicative-mix doc-id bucketing (the events._user_part_ids
    discipline): robust to strided id sets."""
    h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int32)


def _attach_partition_count(n_docs: int) -> int:
    """Power-of-two partition count for the signature-attach passes
    (~200k sig rows ≈ 50 MB per partition), clamped to [8, 65536]."""
    target = max(1, n_docs // 200_000)
    return max(8, min(65536, 1 << (target - 1).bit_length()))


def _attach_and_score(cand, sigs, *, threshold: float, n_docs: int):
    """Re-attach full signatures to the (few) candidate pairs and score
    est_jaccard — the second half of the narrow-exchange LSH design.

    Two co-partition passes, each ONE groupby over a tagged union of
    pair rows and sig rows (part = hash(key doc id)):
      pass 1 keyed by doc_a: global pair dedup (every copy of a pair
        shares doc_a, so partition-local dedup IS global) + attach
        sig_a; re-emit keyed by doc_b;
      pass 2 keyed by doc_b: attach sig_b, est = fraction of agreeing
        slots (identical arithmetic to the old riding-signature path),
        threshold filter.
    The sig table crosses the wire twice at 256 B/doc — at 1M docs
    ~0.5 GB total vs the ~8.5 GB the riding-signature band exchange
    moved (VERDICT r4 #3)."""
    sig_type = pa.list_(pa.int32())
    n_apart = _attach_partition_count(n_docs)
    i8_zeros = lambda n: pa.array(np.zeros(n, np.int8), pa.int8())  # noqa: E731

    def _sig_varlist(values: pa.Array, n: int) -> pa.ListArray:
        """(n*N_PERM,) int32 child → variable-size list<int32> rows of
        length N_PERM. The union's sig column must be a VAR-SIZE list:
        Ray's polars-backed sort rejects a fixed_size_list block whose
        child is shorter than n*width, which is exactly the layout
        `pa.nulls(n, fixed_size_list)` produces — an all-pair-row block
        reaching the sort crashed on it (sf0.1, round 5)."""
        off = pa.array(np.arange(0, (n + 1) * N_PERM, N_PERM, dtype=np.int32))
        return pa.ListArray.from_arrays(off, values)

    def _empty_lists(n: int) -> pa.ListArray:
        """n empty list<int32> rows — 4 B/row of offsets, no validity
        mask, polars-safe. Pair rows never have their sig read (the
        is_sig flag splits), so empty beats null."""
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], pa.int32())
        )

    def tag_sigs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        sig32 = t.column("sig32")
        if isinstance(sig32, pa.ChunkedArray):
            sig32 = sig32.combine_chunks()
        return pa.table(
            {
                "part": pa.array(_doc_part_ids(ids, n_apart), pa.int32()),
                "is_sig": pa.array(np.ones(len(ids), np.int8), pa.int8()),
                "k": t.column("doc_id"),
                "other": pa.nulls(len(ids), pa.int64()),
                "sig": _sig_varlist(sig32.flatten(), len(ids)),
            }
        )

    def tag_pairs(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("doc_a"), dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(_doc_part_ids(a, n_apart), pa.int32()),
                "is_sig": i8_zeros(len(a)),
                "k": t.column("doc_a"),
                "other": t.column("doc_b"),
                "sig": _empty_lists(len(a)),
            }
        )

    def _split(g: pa.Table):
        is_sig = np.asarray(g.column("is_sig"))
        k = np.asarray(g.column("k"), dtype=np.int64)
        sidx = np.flatnonzero(is_sig == 1)
        pidx = np.flatnonzero(is_sig == 0)
        sig_col = g.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        skeys = k[sidx]
        so = np.argsort(skeys)
        smat = (
            np.asarray(sig_col.take(pa.array(sidx[so], pa.int64())).flatten())
            .reshape(len(sidx), N_PERM)
            if len(sidx)
            else np.empty((0, N_PERM), np.int32)
        )
        return k, sidx, pidx, sig_col, skeys[so], smat

    def pass1(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part": pa.array([], pa.int32()),
                "is_sig": pa.array([], pa.int8()),
                "k": pa.array([], pa.int64()),
                "other": pa.array([], pa.int64()),
                "sig": pa.array([], sig_type),
            }
        )
        k, sidx, pidx, sig_col, skeys, smat = _split(g)
        if not len(pidx):
            return empty
        pk = k[pidx]
        # take pair rows FIRST: sig rows carry NULL in "other" and a
        # whole-column asarray would go through float NaN
        pother = np.asarray(
            g.column("other").take(pa.array(pidx, pa.int64())), dtype=np.int64
        )
        o = np.lexsort((pother, pk))
        pk, pother = pk[o], pother[o]
        first = np.concatenate(
            [[True], (pk[1:] != pk[:-1]) | (pother[1:] != pother[:-1])]
        )
        pk, pother = pk[first], pother[first]
        att = smat[np.searchsorted(skeys, pk)]
        return pa.table(
            {
                "part": pa.array(_doc_part_ids(pother, n_apart), pa.int32()),
                "is_sig": i8_zeros(len(pk)),
                "k": pa.array(pother, pa.int64()),
                "other": pa.array(pk, pa.int64()),
                "sig": _sig_varlist(pa.array(att.reshape(-1), pa.int32()), len(pk)),
            }
        )

    def pass2(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )
        k, sidx, pidx, sig_col, skeys, smat = _split(g)
        if not len(pidx):
            return empty
        pk = k[pidx]  # doc_b
        pother = np.asarray(
            g.column("other").take(pa.array(pidx, pa.int64())), dtype=np.int64
        )  # doc_a; pair rows only — sig rows carry NULL here
        amat = np.asarray(
            sig_col.take(pa.array(pidx, pa.int64())).flatten()
        ).reshape(len(pidx), N_PERM)
        bmat = smat[np.searchsorted(skeys, pk)]
        est = (amat == bmat).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "doc_a": pa.array(pother[keep], pa.int64()),
                "doc_b": pa.array(pk[keep], pa.int64()),
                "est_jaccard": pa.array(est[keep], pa.float64()),
            }
        )

    tagged_sigs = sigs.map_batches(
        tag_sigs, batch_format="pyarrow", zero_copy_batch=True
    )
    tagged_pairs = cand.map_batches(
        tag_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    with_a = (
        tagged_pairs.union(tagged_sigs)
        .groupby("part")
        .map_groups(pass1, batch_format="pyarrow")
    )
    return (
        with_a.union(tagged_sigs)
        .groupby("part")
        .map_groups(pass2, batch_format="pyarrow")
    )


def minhash_lsh_pairs(
    ds,
    threshold: float = 0.5,
    *,
    concurrency=None,
    max_bucket: int = 200,
    broadcast_max_docs: int = MINHASH_BROADCAST_MAX_DOCS,
):
    """MinHash/LSH near-dup candidates with estimated Jaccard ≥ τ.

    With r=4, b=16 the LSH hit probability is 1-(1-J⁴)¹⁶: ≈0.97 at
    J=0.7, ≈1-1e-10 at J=0.95 — high recall for the near-dup regime;
    exactness is ngram_jaccard_pairs' job.

    Narrow-exchange shape (VERDICT r4 #3): the bucket shuffle moves
    (doc_id, band_idx, band_key) ONLY — 320 B/doc instead of the 8.5 KB
    the riding-signature layout cost at 16 bands × 512 B — and the full
    signatures are re-attached to just the candidate pairs by
    `_attach_and_score`'s two co-partition passes over the materialized
    256 B/doc sig table.

    The signature stage runs as stateless TASKS with a once-per-worker
    cached MinHashLSH (elastic parallelism — a fixed 2-actor pool
    measured as the whole pipeline's bottleneck); pass ``concurrency``
    to pin an actor pool instead when embedding this in a larger job."""
    import functools

    if concurrency is None:
        sigs = ds.map_batches(
            minhash_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        sigs = ds.map_batches(
            MinHashLSH,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
            num_cpus=0.5,
        )
    # Materialize the NARROW per-doc signature table (256 B/doc), then
    # size every downstream exchange from its row count. Counting the
    # INPUT here instead would re-execute an arbitrary caller-supplied
    # upstream pipeline (cleaning stages, joins) once for the count and
    # once for the signatures — the trap dedup_corpus's sizing comment
    # warns about.
    sigs = sigs.materialize()
    n_docs = sigs.count()
    bands = sigs.map_batches(
        _explode_band_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    n_bpart = _band_partition_count(n_docs * N_BANDS)

    def add_bpart(t: pa.Table) -> pa.Table:
        mixed = pc.bit_wise_xor(
            t.column("band_key"),
            pc.shift_left(pc.cast(t.column("band_idx"), pa.int64()), 58),
        )
        return t.append_column(
            "bpart",
            pc.cast(pc.bit_wise_and(mixed, np.int64(n_bpart - 1)), pa.int32()),
        )

    parted = bands.map_batches(add_bpart, batch_format="pyarrow", zero_copy_batch=True)
    if n_docs <= broadcast_max_docs:
        # small-corpus fast path: broadcast the bounded sig matrix and
        # score inside the band partition — two exchanges total
        import ray
        from ray.data.aggregate import Max

        sig_ref = ray.put(_gather_sig_matrix(sigs))
        scored = parted.groupby("bpart").map_groups(
            functools.partial(
                _scored_pairs_from_band_partition,
                max_bucket=max_bucket,
                threshold=threshold,
                sig_ref=sig_ref,
            ),
            batch_format="pyarrow",
        )
        # the same pair can still surface from bands in DIFFERENT
        # partitions; est is identical every time → Max = pick-any
        return scored.groupby(["doc_a", "doc_b"]).aggregate(
            Max("est_jaccard", alias_name="est_jaccard")
        )
    cand = parted.groupby("bpart").map_groups(
        functools.partial(_cand_pairs_from_band_partition, max_bucket=max_bucket),
        batch_format="pyarrow",
    )
    return _attach_and_score(cand, sigs, threshold=threshold, n_docs=n_docs)


# --- SimHash --------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4 × 16-bit bands → guaranteed hit for hamming ≤ 3


def simhash64(text: str) -> int:
    """64-bit SimHash over md5-derived token hashes (md5_number_lower —
    DuckDB-reproducible, so the simhash_dups oracle replays the whole
    construction in SQL), weighted by token frequency: bit j of the
    result = sign of Σ_tokens w·(2·bit_j(h)-1)."""
    toks = _TOKEN_RE.findall(text or "")
    if not toks:
        return 0
    uniq: dict[str, int] = {}
    for t in toks:
        uniq[t] = uniq.get(t, 0) + 1
    hs = np.array([_md5_low64(t.encode("utf-8")) for t in uniq], dtype=np.uint64)
    w = np.array(list(uniq.values()), dtype=np.int64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = ((2 * bits - 1) * w[:, None]).sum(axis=0)
    # vectorized bit-pack: bit j set iff acc[j] > 0
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


class SimHash:
    """Task/actor stage: append a `simhash` (int64 bit-pattern) column.

    Vectorized batch path (VERDICT r3 #1): token frequencies from the
    shared Arrow producer, each distinct token digested once from the
    dictionary buffers, then the weighted bit accumulation runs as
    chunked ``np.add.reduceat`` passes (≤ ~2^18 tokens × 64 bits per
    chunk). Bit-identical to the scalar ``simhash64`` (parity-tested);
    tokenless rows keep simhash 0, as before."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        vals = np.zeros(n, dtype=np.uint64)
        rows, toks, counts, starts = _token_count_rows(batch.column("text"))
        if len(rows):
            uniq, idx = _md5_hash_strings(toks, bits=64, encoded=True)
            n_segs = len(starts) - 1
            acc = np.empty((n_segs, SIMHASH_BITS), dtype=np.int64)
            bit_shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
            # ±1 bit-sign table computed once per DISTINCT token, then
            # gathered per occurrence and weighted by its count
            signs = (
                2 * ((uniq[:, None] >> bit_shifts[None, :]) & np.uint64(1)).astype(np.int64)
                - 1
            )
            for i, j in _segment_chunks(starts, 1 << 18):
                lo, hi = starts[i], starts[j]
                contrib = signs[idx[lo:hi]] * counts[lo:hi, None]
                acc[i:j] = np.add.reduceat(contrib, starts[i:j] - lo, axis=0)
            packed = ((acc > 0).astype(np.uint64) << bit_shifts[None, :]).sum(
                axis=1
            )
            vals[rows[starts[:-1]]] = packed
        # same-width uint64 -> int64 is a bit-identical reinterpret on
        # both astype and view; view skips the copy (minhash discipline)
        return batch.append_column(
            "simhash", pa.array(vals.view(np.int64), pa.int64())
        )


def _explode_simhash_bands(batch: pa.Table) -> pa.Table:
    ids = np.asarray(batch.column("doc_id"))
    sh = np.asarray(batch.column("simhash")).astype(np.uint64)
    n = len(ids)
    out_id = np.repeat(ids, SIMHASH_BANDS)
    out_band = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int32), n)
    shifts = (np.arange(SIMHASH_BANDS, dtype=np.uint64) * np.uint64(16))
    keys = ((sh[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)).reshape(-1)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band_idx": pa.array(out_band, pa.int32()),
            "band_key": pa.array(keys.view(np.int64), pa.int64()),
            "simhash": pa.array(
                np.repeat(sh, SIMHASH_BANDS).view(np.int64), pa.int64()
            ),
        }
    )


def _pairs_from_simhash_partition(
    part: pa.Table, max_hamming: int, max_bucket: int
) -> pa.Table:
    """Hamming-near pairs for one hash partition of the simhash
    bucket space (vectorized bucket runs, same dispatch-cost rationale
    as the other dedup pipelines)."""
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )
    if part.num_rows < 2:
        return empty
    order = pc.sort_indices(
        part,
        sort_keys=[
            ("band_idx", "ascending"),
            ("band_key", "ascending"),
            ("doc_id", "ascending"),
        ],
    )
    bidx = np.asarray(part.column("band_idx").take(order))
    bkey = np.asarray(part.column("band_key").take(order))
    ids = np.asarray(part.column("doc_id").take(order))
    sh = np.asarray(part.column("simhash").take(order)).astype(np.uint64)
    newgrp = (bidx[1:] != bidx[:-1]) | (bkey[1:] != bkey[:-1])
    starts = np.concatenate([[0], np.flatnonzero(newgrp) + 1, [len(ids)]])
    sizes = np.diff(starts)
    AI: list[np.ndarray] = []
    BI: list[np.ndarray] = []
    for gi in np.flatnonzero((sizes >= 2) & (sizes <= max_bucket)):
        lo, m = starts[gi], sizes[gi]
        ai, bi = np.triu_indices(m, k=1)
        AI.append(lo + ai)
        BI.append(lo + bi)
    if not AI:
        return empty
    ai = np.concatenate(AI)
    bi = np.concatenate(BI)
    keep = ids[ai] != ids[bi]
    ai, bi = ai[keep], bi[keep]
    x = sh[ai] ^ sh[bi]
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(
        np.int64
    )
    sel = ham <= max_hamming
    return pa.table(
        {
            "doc_a": pa.array(ids[ai][sel], pa.int64()),
            "doc_b": pa.array(ids[bi][sel], pa.int64()),
            "hamming": pa.array(ham[sel], pa.int64()),
        }
    )


def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over near-dup pairs → {doc_id: component_min}.

    Driver-side: the pair list is tiny relative to the corpus (only
    near-duplicates appear). At 100 TB swap for iterative min-label
    propagation (repeat: join labels over edges, keep min, until fixed
    point — each round is one hash join keyed by doc_id)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _cc_num_partitions(n_rows: int, *, rows_per_partition: int = 250_000) -> int:
    """Join-partition count sized from the DATA (edge/node row count),
    not a fixed constant — the suggest_layout discipline
    (pipelines/resumable.py:49-73) applied to the component-labeling
    joins: ~250k rows/partition keeps each join task's build side well
    inside a worker heap at any graph size, with floors/caps so tiny
    graphs don't pay per-partition overhead and huge ones don't create
    degenerate task counts."""
    import math

    return max(8, min(4096, math.ceil(max(1, n_rows) / rows_per_partition)))


def connected_components_distributed(
    pairs_ds, *, num_partitions: int | None = None, max_rounds: int = 50
):
    """Distributed connected components over the near-dup pair graph:
    iterative min-label propagation, every round one hash-join keyed by
    node id — no single machine ever holds the edge list.

    Round r: label(x) ← min(label(x), min over neighbors label(n));
    converges in O(component diameter) rounds (near-dup components are
    cliquish, so typically 1-2). Each round materializes the O(nodes)
    label table to truncate lineage; the driver only sees the scalar
    converged-change count. ``num_partitions`` defaults to a
    metadata-derived count (one cheap count() on the materialized edge
    table — VERDICT r3 #6). Returns a Dataset (node, rep)."""
    from ray.data.aggregate import Min

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").combine_chunks() if isinstance(t.column("doc_a"), pa.ChunkedArray) else t.column("doc_a")
        b = t.column("doc_b").combine_chunks() if isinstance(t.column("doc_b"), pa.ChunkedArray) else t.column("doc_b")
        return pa.table(
            {
                "src": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                "dst": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
            }
        )

    edges = pairs_ds.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if num_partitions is None:
        num_partitions = _cc_num_partitions(edges.count())
    # init: label(x) = min(x, min neighbor) — one groupby, also the
    # distinct-node table
    labels = (
        edges.groupby("src")
        .aggregate(Min("dst", alias_name="nbr_min"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("src"),
                    "rep": pc.min_element_wise(t.column("src"), t.column("nbr_min")),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    converged = False
    for _ in range(max_rounds):
        # candidate label per node = min label among its neighbors
        cand = (
            edges.join(
                labels,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("node",),
            )
            .groupby("dst")
            .aggregate(Min("rep", alias_name="cand"))
        )
        merged = labels.join(
            cand,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("node",),
            right_on=("dst",),
        )

        def step(t: pa.Table) -> pa.Table:
            new = pc.min_element_wise(
                t.column("rep"), t.column("cand").fill_null(np.iinfo(np.int64).max)
            )
            changed = pc.cast(pc.not_equal(new, t.column("rep")), pa.int64())
            return pa.table(
                {"node": t.column("node"), "rep": new, "changed": changed}
            )

        stepped = merged.map_batches(
            step, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        n_changed = stepped.sum("changed")
        labels = stepped.drop_columns(["changed"]).materialize()
        if not n_changed:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"component labeling did not converge in {max_rounds} rounds "
            "(component diameter exceeds the budget — raise max_rounds)"
        )
    return labels


def dedup_corpus(
    ds, pairs_ds, *, id_col: str = "doc_id", driver_pair_limit: int = 1_000_000
):
    """Remove near-duplicates: keep the min-id representative of each
    connected component of the pair graph, drop the rest.

    Two physical paths behind one semantic:
    * pair graph fits the driver (≤ driver_pair_limit edges — the usual
      case, only near-duplicates appear): union-find on the driver, drop
      set broadcast via ray.put, vectorized filter per batch;
    * bigger (a dirty corpus at 100 TB): distributed min-label
      propagation (connected_components_distributed) and a hash-join
      anti-filter — nothing O(edges) or O(corpus) ever on the driver."""
    import ray

    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() <= driver_pair_limit:
        pairs_df = pairs_ds.to_pandas()
        comp = connected_components(list(zip(pairs_df.doc_a, pairs_df.doc_b)))
        drop = {doc for doc, rep in comp.items() if doc != rep}
        drop_ref = ray.put(np.fromiter(drop, dtype=np.int64, count=len(drop)))

        class FilterDups:
            def __init__(self):
                self.drop = ray.get(drop_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = np.asarray(batch.column(id_col))
                keep = ~np.isin(ids, self.drop)
                return batch.filter(pa.array(keep))

        return ds.map_batches(
            FilterDups, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=2, num_cpus=0.5,
        )

    labels = connected_components_distributed(pairs_ds).materialize()
    drops = labels.filter(expr="node != rep").map_batches(
        # explicit match marker: the join drops the right key column
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "is_dup": pa.nulls(t.num_rows, pa.int8()).fill_null(1),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # anti-join partitions sized from the pair-graph node count — free
    # (labels is materialized) and, in the regime where this path runs
    # (> driver_pair_limit edges), proportional to the dup population
    # and hence to corpus scale; ds.count() would re-execute the corpus
    # pipeline just to size a join
    joined = ds.join(
        drops,
        join_type="left_outer",
        num_partitions=_cc_num_partitions(labels.count()),
        on=(id_col,),
        right_on=("node",),
    )

    def keep_unmatched(t: pa.Table) -> pa.Table:
        # left_outer: non-duplicates have no match → is_dup is null
        return t.filter(pc.is_null(t.column("is_dup"))).drop_columns(["is_dup"])

    return joined.map_batches(
        keep_unmatched, batch_format="pyarrow", zero_copy_batch=True
    )


def simhash_pairs(ds, max_hamming: int = 3, *, max_bucket: int = 2000):
    """SimHash near-dup pairs with Hamming distance ≤ k (default 3).

    4 × 16-bit band bucketing: any pair within Hamming ≤ 3 agrees
    exactly on ≥ 1 band (pigeonhole) → recall 1.0 for k ≤ 3 by
    construction; buckets keyed (band_idx, band_key) groupby."""
    import functools

    from ray.data.aggregate import Min

    sim = ds.map_batches(SimHash(), batch_format="pyarrow", zero_copy_batch=True)
    bands = sim.map_batches(
        _explode_simhash_bands, batch_format="pyarrow", zero_copy_batch=True
    )
    # narrow band table materialized once, then counted — see
    # minhash_lsh_pairs for why counting the input would double-execute
    # an arbitrary upstream pipeline
    bands = bands.materialize()
    n_bpart = _band_partition_count(bands.count())

    def add_bpart(t: pa.Table) -> pa.Table:
        mixed = pc.bit_wise_xor(
            t.column("band_key"),
            pc.shift_left(pc.cast(t.column("band_idx"), pa.int64()), 58),
        )
        return t.append_column(
            "bpart",
            pc.cast(pc.bit_wise_and(mixed, np.int64(n_bpart - 1)), pa.int32()),
        )

    parted = bands.map_batches(add_bpart, batch_format="pyarrow", zero_copy_batch=True)
    cand = parted.groupby("bpart").map_groups(
        functools.partial(
            _pairs_from_simhash_partition, max_hamming=max_hamming, max_bucket=max_bucket
        ),
        batch_format="pyarrow",
    )
    return cand.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )
