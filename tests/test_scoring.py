"""Scoring & search operators (stages/scoring.py) vs DuckDB twins on
edge inputs: null/empty/whitespace-only docs, score ties at the k
boundary, vocabulary-boundary frequency ties, quantile index-rule
boundaries on small multisets."""

import duckdb
import pyarrow as pa
import ray.data as rd

from intelligent_ocr_ray.stages.scoring import (
    keyword_search,
    quantile_filter,
    rarity_score,
    tfidf_topterms,
)

TOKEN_SQL = r"'[^ \t\r\n]+'"

EDGE_TEXTS = [
    "hash join hash merge scan",          # repeated query terms
    "hash hash hash",                     # adjacent same-term hits
    "join",                               # single hit
    "row batch scan",                     # zero query hits
    "",                                   # empty
    None,                                 # null
    "   \t\r\n ",                         # whitespace-only
    "merge join",                         # tie candidate
    "join merge",                         # exact tie with previous (by id)
]


def _ds(texts, parallelism=3):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return rd.from_arrow(tbl).repartition(parallelism)


def _duck(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
    )
    return con


def test_keyword_search_matches_duckdb_with_ties():
    got = (
        keyword_search(_ds(EDGE_TEXTS), ("hash", "join", "merge"), k=4)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = _duck(EDGE_TEXTS).execute(
        f"""
        SELECT doc_id, score, rank FROM (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rank
          FROM (SELECT doc_id,
                       len(list_filter(regexp_extract_all(coalesce(text, ''), {TOKEN_SQL}),
                                       x -> x IN ('hash', 'join', 'merge'))) AS score
                FROM documents)
          WHERE score > 0)
        WHERE rank <= 4 ORDER BY rank
        """
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    # the tie branch really fired: docs 7 and 8 tie on score, id breaks it
    ids = got["doc_id"].tolist()
    assert ids.index(7) < ids.index(8) and got["score"].tolist()[0] == 4


def test_keyword_search_empty_result():
    out = keyword_search(_ds(["a b", None, ""]), ("zzz",), k=5).to_pandas()
    assert len(out) == 0


def test_rarity_score_matches_duckdb_with_vocab_boundary_tie():
    # vocab_k=2 with three tokens: 'b' (3x), and 'a'/'c' tied at 2x —
    # the (n DESC, token ASC) tie-break must pick 'a' on both engines
    texts = ["b b a", "b a c", "c", "", None]
    got = (
        rarity_score(_ds(texts), vocab_k=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _duck(texts).execute(
        f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), {TOKEN_SQL})) AS token
          FROM documents
        ),
        counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        vocab AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 2),
        per_doc AS (
          SELECT t.doc_id, count(*) AS n_tokens, count(v.token) AS n_common,
                 CAST(coalesce(sum(v.n), 0) AS BIGINT) AS freq_sum
          FROM tok t LEFT JOIN vocab v USING (token) GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(p.n_common, 0) AS n_common,
               coalesce(p.freq_sum, 0) AS freq_sum,
               CASE WHEN coalesce(p.n_tokens, 0) > 0
                    THEN CAST(p.n_common AS DOUBLE) / CAST(p.n_tokens AS DOUBLE)
                    ELSE 0.0 END AS common_ratio
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        ORDER BY d.doc_id
        """
    ).df()
    for col in ("doc_id", "n_tokens", "n_common", "freq_sum", "common_ratio"):
        assert got[col].tolist() == want[col].tolist(), col
    # vocab is {b, a}: doc 1 ('b a c') has 2 of 3 common
    row1 = got[got.doc_id == 1].iloc[0]
    assert row1.n_common == 2 and row1.freq_sum == 3 + 2


def test_tfidf_topterms_matches_duckdb_with_score_ties():
    # 'x' is rare (df=1) so it outscores frequent tokens; docs 3 and 4
    # produce exact score ties resolved by token ASC on both engines
    texts = [
        "x a a b",        # x: tf=1 df=1; a: tf=2
        "a b b c",
        "c c c a",
        "a b",            # tie: tf=1 each, same df ordering
        "b a",            # same multiset, different order
        "",
        None,
    ]
    got = (
        tfidf_topterms(_ds(texts), vocab_k=4, top_terms=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    want = _duck(texts).execute(
        f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(coalesce(text, ''), {TOKEN_SQL})) AS token
          FROM documents
        ),
        counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        vocab AS (SELECT token FROM counts ORDER BY n DESC, token LIMIT 4),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
               FROM tok JOIN vocab USING (token) GROUP BY token),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM tok JOIN vocab USING (token) GROUP BY doc_id, token),
        scored AS (SELECT doc_id, token, tf, df.df AS df,
                          CAST(tf * 1000000 AS BIGINT) // df.df AS score
                   FROM tf JOIN df USING (token)),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                                ORDER BY score DESC, token) AS rank
                   FROM scored)
        SELECT doc_id, token, tf, df, score, rank FROM ranked WHERE rank <= 2
        ORDER BY doc_id, rank
        """
    ).df()
    for col in ("doc_id", "token", "tf", "df", "score", "rank"):
        assert got[col].tolist() == want[col].tolist(), col
    # the rare term really won where present
    assert got[got.doc_id == 0].iloc[0].token == "x"


def test_source_overlap_matches_duckdb_with_three_way_gram():
    from intelligent_ocr_ray.stages.corpus import source_overlap

    shared = "one two three four five"  # a 5-gram shared by s0/s1/s2
    texts = [
        shared + " tail0",
        shared + " tail1",
        shared,
        "totally different words here now",
        "",
        None,
        "one two three four five six",  # adds a second gram to s0
        shared + " null provenance",    # null source: carries no bit
    ]
    sources = ["s0", "s1", "s2", "s0", "s1", "s2", "s0", None]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )
    got = (
        source_overlap(rd.from_arrow(tbl).repartition(3), ngram=5)
        .to_pandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(
        f"""
        WITH toks AS (SELECT source, regexp_extract_all(coalesce(text, ''), {TOKEN_SQL}) AS w
                      FROM documents),
        gidx AS (SELECT source, w, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i
                 FROM toks),
        grams AS (SELECT DISTINCT source,
                         md5_number_lower(w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                          || ' ' || w[i+3] || ' ' || w[i+4]) AS g
                  FROM gidx)
        SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
        FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    for col in ("source_a", "source_b", "n_shared"):
        assert got[col].tolist() == want[col].tolist(), col
    # the three-way gram credited every pair exactly once
    row = got[(got.source_a == "s0") & (got.source_b == "s1")]
    assert len(row) == 1 and row.iloc[0].n_shared >= 1


def test_source_overlap_all_null_source_block():
    # one BLOCK entirely null-source (crashes a naive groupby shuffle on
    # the key) plus a block whose only gram-producing row is null-source
    # (empties the partial after the bit filter)
    from intelligent_ocr_ray.stages.corpus import source_overlap

    shared = "one two three four five"
    blk1 = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([shared, shared + " more"], pa.string()),
            "source": pa.array([None, None], pa.string()),
        }
    )
    blk2 = pa.table(
        {
            "doc_id": pa.array([2, 3], pa.int64()),
            "text": pa.array([shared + " x", shared + " y"], pa.string()),
            "source": pa.array(["sA", "sB"], pa.string()),
        }
    )
    blk3 = pa.table(
        {
            "doc_id": pa.array([4, 5], pa.int64()),
            "text": pa.array([shared + " z", "short"], pa.string()),
            "source": pa.array([None, "sA"], pa.string()),
        }
    )
    ds = rd.from_arrow(blk1).union(rd.from_arrow(blk2), rd.from_arrow(blk3))
    got = source_overlap(ds, ngram=5).to_pandas()
    assert got.to_dict("records") == [
        {"source_a": "sA", "source_b": "sB", "n_shared": 1}
    ]


def test_weighted_sample_matches_duckdb():
    from intelligent_ocr_ray.stages.sampling import weighted_sample_batch

    # weights hit the interesting branches: 0 tokens (never kept),
    # 1-2 tokens (tiny keep probability), > cap (clamped to cap)
    texts = ["", None, "a", "a b", " ".join(["w"] * 200), "x y z"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(100, 100 + len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        weighted_sample_batch(tbl, cap_pct=80)
        .select(["doc_id", "n_tokens"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(
        f"""
        WITH t AS (SELECT doc_id,
                          len(regexp_extract_all(coalesce(text, ''), {TOKEN_SQL})) AS n_tokens
                   FROM documents)
        SELECT doc_id, n_tokens FROM t
        WHERE ((((doc_id * 48271) % 2147483647) * 48271) % 2147483647) % 100
              < least(n_tokens, 80)
        ORDER BY doc_id
        """
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    # zero-token docs can never survive
    assert 100 not in got["doc_id"].tolist() and 101 not in got["doc_id"].tolist()


CMS_SQL = r"""
    WITH tok AS (SELECT unnest(regexp_extract_all(coalesce(text, ''), '[^ \t\r\n]+')) AS token
                 FROM documents),
    r AS (SELECT unnest(generate_series(0, 3)) AS r),
    coef AS (SELECT r,
                    (md5_number_lower('cms-a-' || CAST(r AS VARCHAR)) % 2147483646) + 1 AS a,
                    md5_number_lower('cms-b-' || CAST(r AS VARCHAR)) % 2147483647 AS b
             FROM r),
    cells AS (SELECT c.r,
                     ((c.a * (md5_number_lower(token) % 4294967296) + c.b) % 2147483647) % 1024 AS cell,
                     count(*) AS n
              FROM tok, coef c GROUP BY 1, 2),
    q AS (SELECT unnest(?) AS token),
    qc AS (SELECT q.token, c.r,
                  ((c.a * (md5_number_lower(q.token) % 4294967296) + c.b) % 2147483647) % 1024 AS cell
           FROM q, coef c)
    SELECT qc.token, CAST(min(coalesce(cells.n, 0)) AS BIGINT) AS est_count
    FROM qc LEFT JOIN cells ON cells.r = qc.r AND cells.cell = qc.cell
    GROUP BY qc.token ORDER BY qc.token
"""


def test_cms_counts_match_duckdb_and_dominate_truth():
    from intelligent_ocr_ray.stages.sketches import cms_token_counts

    texts = [
        "hash join hash merge scan",
        "hash hash hash",
        None,
        "",
        "join scan scan",
    ]
    queries = ("hash", "join", "scan", "zzz")
    got = (
        cms_token_counts(_ds(texts), queries)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    con = _duck(texts)
    want = con.execute(CMS_SQL, [list(sorted(set(queries)))]).df()
    assert got["token"].tolist() == want["token"].tolist()
    assert got["est_count"].tolist() == want["est_count"].tolist()
    # CMS guarantee: est >= true instance count; here w >> vocab so exact
    truth = {"hash": 5, "join": 2, "scan": 3, "zzz": 0}
    for t, e in zip(got["token"], got["est_count"]):
        assert e >= truth[t]


def test_quantile_filter_empty_corpus():
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    out = quantile_filter(rd.from_arrow(empty), q=0.5).to_pandas()
    assert len(out) == 0


def test_quantile_filter_matches_duckdb_index_rule():
    # multiset of token counts {5, 3, 1, 0, 0, 2}; several q values hit
    # different ceil boundaries of the quantile_disc index rule
    texts = ["a a a a a", "b b b", "c", "", None, "d d"]
    for q in (0.0, 0.25, 0.5, 0.75, 0.9, 1.0):
        got = (
            quantile_filter(_ds(texts), q=q)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = _duck(texts).execute(
            f"""
            WITH t AS (SELECT doc_id,
                              len(regexp_extract_all(coalesce(text, ''), {TOKEN_SQL})) AS n_tokens
                       FROM documents),
            c AS (SELECT quantile_disc(n_tokens, {q}) AS cut FROM t)
            SELECT doc_id, n_tokens FROM t, c WHERE n_tokens >= c.cut
            ORDER BY doc_id
            """
        ).df()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert got["n_tokens"].tolist() == want["n_tokens"].tolist(), q
