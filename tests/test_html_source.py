"""sources/htmlsrc.py: the SQL-expressible html corpus and its oracle.

Companion to test_layout_source.py — pins (a) payload structure and
routing, (b) parity between the Ray round-trip through the REAL
boilerplate-strip extractor and the serial per-row extractor, (c)
parity with the DuckDB derivation itself, and (d) that the corpus
actually exercises every branch the derivation claims to cover
(anchor-dropped blocks, entity unescape, whitespace collapse,
script/style subtree removal, min-chars drop).
"""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from intelligent_ocr_ray.config import DEFAULT_CONFIG
from intelligent_ocr_ray.functions.extract import extract_turn, route_payload
from intelligent_ocr_ray.sources.htmlsrc import (
    HTML_SQL,
    SCRIPT_EVERY,
    STYLE_EVERY,
    _html_payloads,
)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def _payloads():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    return pq.read_table(DOCS, columns=["doc_id"]), _html_payloads(t)


def test_html_payloads_route_and_serial_extract():
    _, payloads = _payloads()
    ids = np.asarray(payloads.column("turn_idx"), dtype=np.int64)
    saw_script = saw_style = saw_amp = 0
    for did, text in zip(ids, payloads.column("text").to_pylist()):
        assert route_payload(text, DEFAULT_CONFIG) == "html"
        res, _ = extract_turn(text, DEFAULT_CONFIG, None)
        assert res.status == "ok" and res.route == "html"
        # injected subtrees must never leak into the extraction
        assert "junk" not in res.extracted_text
        assert "color" not in res.extracted_text
        # no tag or raw-entity residue in the visible text
        assert "<" not in res.extracted_text
        assert "&amp;" not in res.extracted_text
        saw_script += did % SCRIPT_EVERY == 0 and "<script>" in text
        saw_style += did % STYLE_EVERY == 0 and "<style>" in text
        saw_amp += "&x" in res.extracted_text
    assert saw_script and saw_style and saw_amp


def test_html_ray_roundtrip_matches_duckdb_derivation():
    import __ray_entry__ as entry

    got = (
        entry.queries()["html_extract"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    want = con.sql(HTML_SQL).df().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["extracted_text"].tolist() == want["extracted_text"].tolist()
    assert got["n_spans"].astype(int).tolist() == want["n_spans"].astype(int).tolist()
    assert set(got["route"]) == {"html"} and set(got["status"]) == {"ok"}
    # real coverage: multi-block docs, per-doc variance, newline joins
    # (the all-blocks-dropped empty case is covered by the fuzz
    # warehouse, whose blank/whitespace docs produce token-less payloads)
    assert (got["n_spans"] > 2).any() and got["n_spans"].nunique() > 1
    assert got["extracted_text"].str.contains("\n").any()


def test_html_block_filters_bite():
    """The link-density drop (class 1) and min-chars drop (class 5)
    must actually remove blocks: total kept spans < total blocks."""
    _, payloads = _payloads()
    total_blocks = sum(
        t.count('<p class="b">') for t in payloads.column("text").to_pylist()
    )
    import __ray_entry__ as entry

    got = entry.queries()["html_extract"](SF).to_pandas()
    assert 0 < got["n_spans"].sum() < total_blocks
