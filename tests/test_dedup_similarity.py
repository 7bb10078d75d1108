"""Near-dedup + similarity-search operators vs independent serial
oracles (SURVEY.md §5 model: every distributed operator is checked
against a brute-force single-process computation on small data)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from intelligent_ocr_ray.stages.dedup import (
    MinHashLSH,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
    word_ngrams,
)
from intelligent_ocr_ray.stages.similarity import (
    ann_topk,
    embedding_neardup,
    ivf_topk,
    load_matrix,
)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def _docs_ds():
    return rd.read_parquet(DOCS, columns=["doc_id", "text"])


def _brute_jaccard(threshold):
    import pyarrow.parquet as pq

    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    gs = [
        (d, word_ngrams(x))
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    ]
    out = {}
    for (a, ga), (b, gb) in itertools.combinations(gs, 2):
        if not ga or not gb:
            continue
        j = len(ga & gb) / len(ga | gb)
        if j >= threshold:
            out[(a, b)] = j
    return out


# --- unit: shingling / signatures ----------------------------------------


def test_word_ngrams():
    assert word_ngrams("a b c d") == {"a b c", "b c d"}
    assert word_ngrams("a b") == set()
    assert word_ngrams("") == set()
    assert word_ngrams(None) == set()


def test_minhash_estimates_jaccard():
    mh = MinHashLSH()
    a = word_ngrams(" ".join(f"w{i}" for i in range(200)))
    b = word_ngrams(" ".join(f"w{i}" for i in range(20, 220)))
    true_j = len(a & b) / len(a | b)
    est = (mh.signature(a) == mh.signature(b)).mean()
    assert abs(est - true_j) < 0.15  # 64 permutations → ±~1/8


def test_minhash_identical_and_disjoint():
    mh = MinHashLSH()
    a = word_ngrams("x y z w v u t s r q p")
    assert (mh.signature(a) == mh.signature(set(a))).all()
    b = word_ngrams("1 2 3 4 5 6 7 8 9 10 11")
    assert (mh.signature(a) == mh.signature(b)).mean() < 0.2


def test_simhash_properties():
    s1 = simhash64("the quick brown fox jumps over the lazy dog " * 5)
    s2 = simhash64("the quick brown fox jumps over the lazy dog " * 5)
    assert s1 == s2  # deterministic
    s3 = simhash64("the quick brown fox jumps over the lazy cat " * 5)
    ham_near = bin(s1 ^ s3).count("1")
    s4 = simhash64("completely different text about astrophysics and galaxies")
    ham_far = bin(s1 ^ s4).count("1")
    assert ham_near < ham_far
    assert simhash64("") == 0


# --- e2e vs brute force ---------------------------------------------------


def test_ngram_jaccard_pairs_exact():
    got = ngram_jaccard_pairs(_docs_ds(), threshold=0.5).to_pandas()
    got_map = {
        (a, b): j for a, b, j in zip(got.doc_a, got.doc_b, got.jaccard)
    }
    want = _brute_jaccard(0.5)
    # df cap can only *drop* pairs built from boilerplate grams; on this
    # corpus no gram exceeds df=100, so the result is exactly brute force
    assert got_map.keys() == want.keys()
    for k, j in want.items():
        assert got_map[k] == pytest.approx(j, abs=1e-12)


def test_minhash_lsh_recall_and_precision():
    got = minhash_lsh_pairs(_docs_ds(), threshold=0.5).to_pandas()
    got_pairs = set(zip(got.doc_a, got.doc_b))
    exact_hi = {k for k, j in _brute_jaccard(0.0).items() if j >= 0.8}
    # r=4,b=16 → hit prob ≈1 at J≥0.8: full recall expected here
    assert exact_hi <= got_pairs
    # estimates should be near truth for the pairs both agree on
    truth = _brute_jaccard(0.3)
    for (a, b), est in zip(got_pairs, got.est_jaccard):
        if (a, b) in truth:
            assert abs(est - truth[(a, b)]) < 0.25


def test_simhash_pairs_vs_brute_force():
    import pyarrow.parquet as pq

    got = simhash_pairs(_docs_ds(), max_hamming=3).to_pandas()
    got_set = {(a, b, h) for a, b, h in zip(got.doc_a, got.doc_b, got.hamming)}
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    sh = {
        d: simhash64(x)
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    want = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        h = bin(sh[a] ^ sh[b]).count("1")
        if h <= 3:
            want.add((a, b, h))
    # banding guarantees recall 1.0 for hamming ≤ 3 (pigeonhole over 4 bands)
    assert got_set == want


def test_embedding_neardup_vs_brute_force():
    got = embedding_neardup(SF, threshold=0.4).to_pandas()
    ids, mat = load_matrix(f"{SF}/embeddings.parquet")
    sims = mat @ mat.T
    iu, ju = np.triu_indices(len(ids), 1)
    sel = sims[iu, ju] >= 0.4
    want = {
        (int(ids[i]), int(ids[j])): int(np.round(sims[i, j] * 1e6))
        for i, j in zip(iu[sel], ju[sel])
    }
    got_map = {
        (a, b): m for a, b, m in zip(got.vec_id_a, got.vec_id_b, got.cos_micros)
    }
    assert got_map == want


def test_ann_topk_vs_brute_force():
    got = ann_topk(SF, n_queries=4, k=5).to_pandas()
    ids, mat = load_matrix(f"{SF}/embeddings.parquet")
    for q in range(4):
        qv = mat[ids == q][0]
        sims = mat @ qv
        mask = ids != q
        cand = sorted(
            zip(-sims[mask], ids[mask])
        )[:5]
        want = [int(i) for _, i in cand]
        g = got[got.query_id == q].sort_values("rank")
        assert list(g.neighbor_id) == want
        assert list(g["rank"]) == [1, 2, 3, 4, 5]


def test_ivf_recall():
    exact = ann_topk(SF, n_queries=8, k=10).to_pandas()
    approx = ivf_topk(SF, n_queries=8, k=10).to_pandas()
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(e & a) / len(e)
    # weakly-clustered synthetic vectors are an adversarial case for
    # IVF; nprobe=8/16 still has to find most true neighbors
    assert recall >= 0.6
    assert len(approx) == len(exact)


def test_connected_components_union_find():
    from intelligent_ocr_ray.stages.dedup import connected_components

    comp = connected_components([(1, 2), (2, 3), (10, 11), (3, 1)])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert connected_components([]) == {}


def test_dedup_corpus_keeps_representatives():
    from intelligent_ocr_ray.stages.dedup import (
        connected_components,
        dedup_corpus,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(_docs_ds(), threshold=0.5)
    kept = dedup_corpus(_docs_ds(), pairs).to_pandas()
    # oracle: union-find the EXACT jaccard pair graph at the same τ
    exact = _brute_jaccard(0.5)
    comp = connected_components(list(exact.keys()))
    drop = {d for d, rep in comp.items() if d != rep}
    assert set(kept.doc_id) == set(range(500)) - drop
    # representatives (component minima) always survive
    assert all(rep in set(kept.doc_id) for rep in comp.values())


def test_dedup_pair_tables_are_canonical():
    got = ngram_jaccard_pairs(_docs_ds(), threshold=0.5).to_pandas()
    assert (got.doc_a < got.doc_b).all()
    mh = minhash_lsh_pairs(_docs_ds(), threshold=0.5).to_pandas()
    assert (mh.doc_a < mh.doc_b).all()
    assert not mh.duplicated(["doc_a", "doc_b"]).any()


# --- exact dedup (content-hash keyed) -------------------------------------


def test_exact_dedup_matches_text_groupby():
    """Hash-keyed dedup ≡ grouping by the raw text (the key it replaced),
    and the md5 key matches DuckDB's md5() for oracle parity."""
    import duckdb

    from intelligent_ocr_ray.stages.dedup import exact_dedup

    texts = ["alpha beta", "gamma", "alpha beta", "", "gamma", "delta δ"]
    ids = [5, 2, 1, 9, 0, 7]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    got = {
        r["content_hash"]: r["doc_id"] for r in exact_dedup(ds).take_all()
    }
    want = duckdb.sql(
        "SELECT md5(t) AS h, min(i) AS i FROM (SELECT unnest(?) t, unnest(?) i)"
        " GROUP BY md5(t)",
        params=[texts, ids],
    ).fetchall()
    assert got == {h: i for h, i in want}
    # survivors = min id per distinct text
    assert sorted(got.values()) == [0, 1, 7, 9]


def test_embedding_neardup_multiblock_equals_single():
    """Block-pair decomposition is exact: tiny blocks (forcing many
    cross-block tasks) produce the identical pair set + cos as one
    block."""
    from intelligent_ocr_ray.stages.similarity import embedding_neardup

    one = embedding_neardup(SF, threshold=0.4, block_rows=100_000).to_pandas()
    many = embedding_neardup(SF, threshold=0.4, block_rows=64).to_pandas()
    key = ["vec_id_a", "vec_id_b"]
    one = one.sort_values(key).reset_index(drop=True)
    many = many.sort_values(key).reset_index(drop=True)
    assert one.equals(many)
    assert len(one) > 0


def test_embedding_neardup_bucketed_recall():
    from intelligent_ocr_ray.stages.similarity import (
        embedding_neardup,
        embedding_neardup_bucketed,
    )

    exact = embedding_neardup(SF, threshold=0.4).to_pandas()
    approx = embedding_neardup_bucketed(
        SF, threshold=0.4, n_lists=16, n_assign=4
    ).to_pandas()
    e = set(zip(exact.vec_id_a, exact.vec_id_b))
    a = set(zip(approx.vec_id_a, approx.vec_id_b))
    assert a <= e  # verify step is exact: no false positives
    recall = len(e & a) / len(e)
    # measured 0.97 at sf0.001 / 0.959 at sf0.1 (n_lists=16, n_assign=4)
    assert recall >= 0.9, recall
    # cos values of found pairs are bit-identical to the exact operator
    em = {(x, y): c for x, y, c in zip(exact.vec_id_a, exact.vec_id_b, exact.cos_micros)}
    for x, y, c in zip(approx.vec_id_a, approx.vec_id_b, approx.cos_micros):
        assert em[(x, y)] == c


def test_sample_matrix_bounded_and_deterministic():
    from intelligent_ocr_ray.stages.similarity import sample_matrix

    ids1, m1 = sample_matrix(f"{SF}/embeddings.parquet", 100)
    ids2, m2 = sample_matrix(f"{SF}/embeddings.parquet", 100)
    assert np.array_equal(ids1, ids2) and np.array_equal(m1, m2)
    assert len(ids1) <= 150  # ~target, never the whole table
    # full-table path (target >= n) returns everything, sorted by id
    ids3, _ = sample_matrix(f"{SF}/embeddings.parquet", 10_000)
    assert len(ids3) == 500 and np.all(np.diff(ids3) > 0)


def test_distributed_components_equal_union_find():
    """Min-label propagation (Dataset joins) ≡ driver union-find,
    including a chain component whose diameter forces several rounds."""
    from intelligent_ocr_ray.stages.dedup import (
        connected_components,
        connected_components_distributed,
    )

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (20, 21), (7, 3)]
    pairs_ds = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                "doc_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )
    labels = connected_components_distributed(pairs_ds).to_pandas()
    got = dict(zip(labels.node, labels.rep))
    want = connected_components(pairs)
    assert got == want


def test_dedup_corpus_distributed_path_equals_driver_path():
    from intelligent_ocr_ray.stages.dedup import dedup_corpus, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs_ds(), threshold=0.5)
    via_driver = sorted(
        r["doc_id"] for r in dedup_corpus(_docs_ds(), pairs).select_columns(["doc_id"]).take_all()
    )
    via_joins = sorted(
        r["doc_id"]
        for r in dedup_corpus(_docs_ds(), pairs, driver_pair_limit=0)
        .select_columns(["doc_id"])
        .take_all()
    )
    assert via_driver == via_joins
    assert len(via_driver) < 500  # something was actually dropped


def test_embedding_neardup_block_crossover_guard():
    """Past the block-count crossover the exact operator refuses and
    points at the bucketed variant (the driver loop submits n_blocks²
    refs — bounded-memory but not bounded-submission)."""
    with pytest.raises(ValueError, match="bucketed"):
        embedding_neardup(SF, threshold=0.4, block_rows=8, max_blocks=4)
    # explicit override keeps the quadratic path available
    got = embedding_neardup(SF, threshold=0.4, block_rows=128, max_blocks=10_000)
    assert got.count() > 0


def test_exhaustive_bucket_configs_equal_exact():
    """The driver-verified configs: n_assign=n_lists (near-dup) and
    nprobe=n_lists (IVF) must reproduce the exact operators exactly —
    this is what lets them share the exact DuckDB oracles."""
    from intelligent_ocr_ray.stages.similarity import embedding_neardup_bucketed

    key = ["vec_id_a", "vec_id_b"]
    exact = embedding_neardup(SF, threshold=0.4).to_pandas().sort_values(key).reset_index(drop=True)
    exh = (
        embedding_neardup_bucketed(SF, threshold=0.4, n_lists=4, n_assign=4)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    assert exact.equals(exh)

    kq = ["query_id", "rank"]
    topk = ann_topk(SF, n_queries=4, k=5).to_pandas().sort_values(kq).reset_index(drop=True)
    ivf = (
        ivf_topk(SF, n_queries=4, k=5, n_lists=8, nprobe=8)
        .to_pandas().sort_values(kq).reset_index(drop=True)
    )
    assert topk.equals(ivf)


def test_exact_dedup_null_vs_empty_text():
    """NULL text and '' are DISTINCT groups: null keys to the 'null'
    sentinel (no 32-hex digest can collide), '' to md5('') — mirroring
    the oracle's CASE WHEN text IS NULL form (ADVICE r2). Also pins the
    buffer-offset hashing path on sliced/chunked input."""
    from intelligent_ocr_ray.stages.dedup import NULL_CONTENT_KEY, exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([3, 1, 4, 2, 8], pa.int64()),
            "text": pa.array(["", None, "", None, "x"]),
        }
    )
    got = {r["content_hash"]: r["doc_id"] for r in exact_dedup(rd.from_arrow(t)).take_all()}
    import hashlib

    assert got[NULL_CONTENT_KEY] == 1  # min id among the null rows
    assert got[hashlib.md5(b"").hexdigest()] == 3  # min id among '' rows
    assert len(got) == 3


def test_null_text_oracle_parity(tmp_path):
    """Ray and the DuckDB oracles agree on a corpus that CONTAINS null
    text (absent from the driver's testdata): null canonicalizes to ''
    for minhash/simhash/fingerprint — a null-text doc gets the sentinel
    signature / zero hash and pairs with empty-text docs — while
    exact_dedup keeps null and '' as DISTINCT groups (review r3)."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array([None, "", "alpha beta gamma delta", "alpha beta gamma delta", "  "]),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    qs, oracles = entry.queries(), entry.oracle_sql()
    for name in ("minhash_dups", "simhash_dups", "fingerprint", "exact_dedup"):
        got = canon(qs[name](str(tmp_path)).to_pandas())
        want = canon(con.sql(oracles[name]).df())
        assert list(got.columns) == list(want.columns), name
        assert got.astype(str).equals(want.astype(str)), (name, got, want)
    # sanity of the semantics themselves: null+empty+whitespace docs all
    # collide in minhash (sentinel sigs -> est 1.0), and the dup pair too
    mh = qs["minhash_dups"](str(tmp_path)).to_pandas()
    assert {(1, 2), (1, 5), (2, 5), (3, 4)} <= set(zip(mh.doc_a, mh.doc_b))


def test_minhash_broadcast_and_attach_paths_agree():
    """The two minhash_lsh_pairs execution paths — the ≤500k-doc
    broadcast-sig fast path (default at test scale) and the >500k-doc
    narrow two-pass attach exchange (forced via broadcast_max_docs=0) —
    must return the identical pair set with identical est_jaccard."""
    bc = minhash_lsh_pairs(_docs_ds(), threshold=0.5).to_pandas()
    at = minhash_lsh_pairs(
        _docs_ds(), threshold=0.5, broadcast_max_docs=0
    ).to_pandas()
    key = ["doc_a", "doc_b"]
    bc = bc.sort_values(key).reset_index(drop=True)
    at = at.sort_values(key).reset_index(drop=True)
    assert len(bc) == len(at) and len(bc) > 0
    assert (bc[key].values == at[key].values).all()
    assert (bc.est_jaccard.values == at.est_jaccard.values).all()
