"""The full-row flagship oracle (__ray_entry__._extract_full_sql).

Promotes ``extract_transcripts`` from rows-only to hash-checked: every
output column is derived in DuckDB for every route the documents-derived
corpus can produce, with a GENERIC SQL re-parse of the ``%LAYOUT``
grammar (an independent second parser, not an arithmetic derivation) and
a ``translate()`` replay of the CJK variant table.

Two pins:
* an adversarial all-branch fixture (blank/noise/plain/plain_long/
  pdfish ok+empty+boundary-conf+vertical/pdfish header-bad/pdfish
  malformed/CJK variants/negative coords) compared cell-for-cell against
  the serial extractor — no Ray needed;
* the real sf0.001 corpus compared against the actual Ray query.
"""

import duckdb
import pyarrow as pa
import pytest

from intelligent_ocr_ray.config import DEFAULT_CONFIG
from intelligent_ocr_ray.functions.extract import extract_turn
from intelligent_ocr_ray.functions.variants import VariantMapper
from intelligent_ocr_ray.sources.transcripts import N_CONV_BUCKETS

SF = "/root/testdata/sf0.001"

TEXTS = [
    "",                                    # blank: empty
    "   \t\n ",                            # blank: ws only
    "----",                                # blank: noise
    "· • ~~==__",                          # blank: noise mix
    "hello world",                         # plain
    "   padded short text   ",             # plain w/ trim
    "x" * 51,                              # plain_long boundary (51 > 50)
    "  " + "y" * 49 + "  ",                # trimmed len 49 -> plain
    "word " * 30,                          # plain_long, trailing space kept
    "%LAYOUT",                             # pdfish: empty payload, ok
    "%LAYOUT\n10,10,200,22,0.80|alpha beta\n10,40,200,52,0.30|dropme"
    "\n400,10,420,200,0.90|vert col\n\n10,70,150,82,0.55|gamma",
    "%LAYOUT\n10,10,200,22,0.5|edge conf",         # conf == 0.5 kept
    "%LAYOUT\n10,10,200,22,0.9|   ",               # empty-after-trim span drop
    "%LAYOUT\n5,5,6,30,0.9|tall\n1,1,100,10,0.9|wide\n0,0,50,9,0.95|first",
    "%LAYOUTX\n1,2,3,4,0.9|x",                     # header bad -> fallback
    "%LAYOUT\nnot a layout line",                  # malformed -> fallback
    "%LAYOUT\n10,10,200,22,0.9|ok line\nBAD LINE HERE",
    "竜と鉄の時代",                         # plain CJK -> variant normalized
    "旧字体の変換規則 " * 6,                 # plain_long CJK w/ variants
    "-1,2,3",                              # plain (digits are not noise)
    "%LAYOUT\n-5,-5,10,2,0.75|neg coords",  # negative coords parse
]

COLS = ["conv_id", "turn_idx", "route", "extracted_text",
        "text_normalized", "status", "error"]


def _serial_expected(docs: pa.Table) -> list[dict]:
    mapper = VariantMapper()
    rows = []
    for did, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        ext, norm = extract_turn(text, DEFAULT_CONFIG, mapper)
        rows.append({
            "conv_id": f"c{did % N_CONV_BUCKETS:05d}",
            "turn_idx": did // N_CONV_BUCKETS,
            "route": ext.route,
            "extracted_text": ext.extracted_text,
            "text_normalized": norm,
            "status": ext.status,
            "error": ext.error,
        })
    return rows


def test_full_oracle_matches_serial_on_all_branches():
    import __ray_entry__ as entry

    docs = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })
    con = duckdb.connect()
    con.register("documents", docs)
    got = (
        con.sql(entry._extract_full_sql())
        .df()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = sorted(_serial_expected(docs), key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert len(got) == len(want)
    for i, w in enumerate(want):
        for col in COLS:
            gv = got.iloc[i][col]
            if gv != gv:  # NaN -> None
                gv = None
            if col == "turn_idx":
                gv = int(gv)
            assert gv == w[col], (w["conv_id"], w["turn_idx"], col, gv, w[col])
    # the fixture actually exercises every branch the oracle claims
    routes = {w["route"] for w in want}
    assert {"blank", "plain", "plain_long", "pdfish", "error"} <= routes
    assert any(w["status"] == "fallback" for w in want)
    assert any(w["text_normalized"] for w in want)
    assert any(w["error"] and "malformed layout line" in w["error"] for w in want)


def test_full_oracle_matches_ray_on_real_corpus(ray_session):
    import __ray_entry__ as entry

    got = (
        entry.queries()["extract_transcripts"](SF)
        .to_pandas()[COLS]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.sql(entry.oracle_sql()["extract_transcripts"])
        .df()[COLS]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for col in COLS:
        g = got[col].where(got[col].notna(), None).tolist()
        w = want[col].where(want[col].notna(), None).tolist()
        if col == "turn_idx":
            g, w = [int(v) for v in g], [int(v) for v in w]
        assert g == w, f"column {col} mismatch"


def test_variant_translate_literals_replay_mapper():
    """translate(s, frm, to) must equal VariantMapper.normalize for any
    string over the mapped alphabet (first-wins order preserved)."""
    import __ray_entry__ as entry

    frm, to = entry._variant_translate_literals()
    mapper = VariantMapper()
    assert len(frm) == len(to) == len(mapper.mapping)
    assert dict(zip(frm, to)) == mapper.mapping
    probe = frm + "abc 漢字" + frm[::-1]
    con = duckdb.connect()
    got = con.execute(
        "SELECT translate(?, ?, ?)", [probe, frm, to]
    ).fetchone()[0]
    assert got == mapper.normalize(probe)


@pytest.mark.parametrize("bad", ["%LAYOUT\nx'quoted'", "%LAYOUT\n10,10,\x01"])
def test_full_oracle_unreproducible_error_is_loud_null(bad):
    """Malformed lines whose Python repr isn't plain-quoted yield a NULL
    error cell — a LOUD mismatch, never a silent pass."""
    import __ray_entry__ as entry

    docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array([bad], pa.string())})
    con = duckdb.connect()
    con.register("documents", docs)
    row = con.sql(entry._extract_full_sql()).df().iloc[0]
    assert row["status"] == "fallback"
    assert row["error"] is None or row["error"] != row["error"]
