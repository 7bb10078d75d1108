"""sources/layout.py: the SQL-expressible pdfish corpus and its oracle.

The layout source exists to put the REAL ``%LAYOUT`` parser under the
driver's cell-level oracle (VERDICT r3 #2); these tests pin (a) payload
grammar validity, (b) ladder recovery on the malformed docs, (c) parity
between the Ray round-trip and the serial extractor, and (d) parity
with the DuckDB derivation itself.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from intelligent_ocr_ray.config import DEFAULT_CONFIG
from intelligent_ocr_ray.functions.extract import (
    degraded_ladder,
    extract_turn_ladder,
)
from intelligent_ocr_ray.sources.layout import (
    LAYOUT_SQL,
    MALFORMED_EVERY,
    _layout_payloads,
    layout_from_documents,
)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def test_layout_payloads_parse_and_ladder_recovery():
    import pyarrow.parquet as pq

    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    payloads = _layout_payloads(t)
    ids = np.asarray(payloads.column("turn_idx"), dtype=np.int64)
    ladder = degraded_ladder(DEFAULT_CONFIG)
    n_recovered = 0
    for did, text in zip(ids, payloads.column("text").to_pylist()):
        assert text.startswith("%LAYOUT")
        res, _ = extract_turn_ladder(text, DEFAULT_CONFIG, ladder)
        assert res.status == "ok" and res.route == "pdfish"
        if res.error:
            assert res.error.startswith("degraded[0]")
            assert did % MALFORMED_EVERY == 0
            n_recovered += 1
    # the malformed-line docs exist and all took the lenient rung
    assert n_recovered > 0


def test_layout_ray_roundtrip_matches_duckdb_derivation():
    import __ray_entry__ as entry

    got = (
        entry.queries()["pdfish_extract"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    want = con.sql(LAYOUT_SQL).df().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["extracted_text"].tolist() == want["extracted_text"].tolist()
    assert got["n_spans"].astype(int).tolist() == want["n_spans"].astype(int).tolist()
    assert set(got["route"]) == {"pdfish"} and set(got["status"]) == {"ok"}
    # real coverage: multi-span docs and per-doc span VARIANCE occur
    # (the conf filter + empty-txt drop bite different docs differently)
    assert (got["n_spans"] > 3).any() and got["n_spans"].nunique() > 1
    assert got["extracted_text"].str.contains("\n").any()


def test_layout_source_reading_order_has_verticals():
    """At least one doc interleaves vertical spans after horizontal ones
    (right-to-left column order is covered by the serial-parity test —
    here we pin that the corpus actually exercises that branch)."""
    ds = layout_from_documents(SF)
    from intelligent_ocr_ray.pipelines.extract import extract_dataset

    out = extract_dataset(ds, DEFAULT_CONFIG, use_ladder=True)
    spans = out.select_columns(["spans"]).take_all()
    n_vert = sum(
        1 for r in spans for s in (r["spans"] or []) if s["vertical"]
    )
    assert n_vert > 0
