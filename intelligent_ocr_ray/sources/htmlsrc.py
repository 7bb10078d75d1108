"""documents → deterministic HTML payloads (SQL-expressible).

Companion to ``sources/layout.py`` (the pdfish branch): this source
puts the OTHER payload-parsing flagship branch — the html
boilerplate-strip extractor (link-density + text-density block filter,
functions/extract.py:192-233; the engine analog of the reference's
dual-layer text embed, core/pdf_processor.py:627-659) — under a
cell-level DuckDB oracle. A deterministic html payload is derived from
every ``documents`` row with arithmetic DuckDB replays verbatim
(``HTML_SQL``); the REAL Ray extractor then round-trips it through the
actual script/style strip, block-tag split, per-block visible/anchor
measurement, link-density + min-chars + confidence filter, entity
unescape, whitespace collapse and NFKC — and the oracle derives the
expected output directly from the same arithmetic, never by re-parsing
the payload. Any divergence in the real parser shows up as a hash
mismatch.

Derivation contract (keep in lockstep with ``HTML_SQL``):

* tokens = ASCII-alphanumeric runs ``[A-Za-z0-9]+`` of the doc text
  (alnum ⇒ no tags/entities can leak into the payload, and NFKC is the
  identity on both engines), first 12, each truncated to 24 chars;
* block i (0-based) for doc d wraps content in ``<p class="b">…</p>``;
  with r8 = repeat(tok, 8) and r4 = repeat(tok, 4) (amplification so
  natural-language-length tokens clear the 20-char keep floor at
  length >= 3 while 1-2-char tokens still exercise the drop path),
  content by class = (d + i) % 6:
    0: r8                           → visible = r8
    1: <a href="#">r8</a>           → link_density 1 → DROPPED (ld)
    2: r8 <a href="#">ok</a>        → visible = r8 ' ok', anchor = 2
    3: r8&amp;x                     → visible = r8 '&x' (unescape path)
    4: r4 \t r4                     → visible = r4 ' ' r4 (ws collapse)
    5: first 3 chars of tok         → DROPPED (< html_min_block_chars)
* docs with d % 23 == 0 get a ``<script>`` subtree (containing a bare
  '<' and braces) injected after <body>; docs with d % 31 == 0 a
  ``<style>`` subtree — both must vanish in step 1 of the extractor
  and never reach the oracle's arithmetic;
* payload = '<html><body>' + blocks + '</body></html>' (the open+close
  tag pair routes it to the html extractor even for token-less docs).

Keep rule replayed by the oracle (config defaults pinned in the SQL):
len(visible) >= html_min_block_chars(20) AND link_density <=
html_max_link_density(0.5) AND 1 - link_density >= min_confidence(0.5),
blocks joined with '\n' in document order. Both engines compute
link_density as one exact IEEE double division (anchor / len), per the
repo's cross-engine float discipline.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_BLOCKS = 12
MAX_TOKEN_CHARS = 24
SCRIPT_EVERY = 23
STYLE_EVERY = 31

_SCRIPT = '<script>if(1<2){q="junk"}</script>'
_STYLE = "<style>.b{color:#fff}</style>"


def _html_payloads(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (conv_id, turn_idx, role, text=payload) — fully
    vectorized: one regex split, class selection by integer arithmetic,
    Arrow element-wise joins; no per-row Python."""
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    # turn_idx is int32 by the transcript schema; a wrapped id would
    # silently corrupt the doc_id the oracle joins on — refuse instead
    if len(ids) and ids.max() >= 2**31:
        raise ValueError(
            "html oracle corpus requires doc_id < 2^31 (turn_idx is int32)"
        )
    n = len(ids)
    toks_list = pc.split_pattern_regex(
        pc.coalesce(batch.column("text"), pa.scalar("", pa.string())),
        "[^A-Za-z0-9]+",
    )
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    row_of = np.repeat(
        np.arange(n, dtype=np.int64),
        np.asarray(pc.list_value_length(toks_list), dtype=np.int64),
    )
    # regex SPLIT emits '' at run boundaries where findall would not —
    # drop them, then keep the first MAX_BLOCKS tokens per row
    keep = np.asarray(pc.greater(pc.utf8_length(flat), 0)).astype(bool)
    flat = flat.filter(pa.array(keep))
    row_of = row_of[keep]
    starts = np.searchsorted(row_of, np.arange(n, dtype=np.int64))
    pos = np.arange(len(row_of), dtype=np.int64) - starts[row_of]
    keep12 = pos < MAX_BLOCKS
    tok = pc.utf8_slice_codeunits(flat.filter(pa.array(keep12)), 0, MAX_TOKEN_CHARS)
    row_of = row_of[keep12]
    i = pos[keep12]

    cls = (ids[row_of] + i) % 6

    def j(*parts):
        return pc.binary_join_element_wise(*parts, "")

    r8 = pc.binary_repeat(tok, 8)
    r4 = pc.binary_repeat(tok, 4)
    content = j('<a href="#">', r8, "</a>")  # class 1
    content = pc.if_else(pa.array(cls == 0), r8, content)
    content = pc.if_else(pa.array(cls == 2), j(r8, ' <a href="#">ok</a>'), content)
    content = pc.if_else(pa.array(cls == 3), j(r8, "&amp;x"), content)
    content = pc.if_else(pa.array(cls == 4), j(r4, "\t ", r4), content)
    content = pc.if_else(
        pa.array(cls == 5), pc.utf8_slice_codeunits(tok, 0, 3), content
    )
    blocks = j('<p class="b">', content, "</p>")
    if isinstance(blocks, pa.ChunkedArray):
        blocks = blocks.combine_chunks()

    n_blocks = np.zeros(n, dtype=np.int64)
    np.add.at(n_blocks, row_of, 1)
    offsets = np.concatenate([[0], np.cumsum(n_blocks)]).astype(np.int32)
    body = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), blocks), ""
    )

    prefix = pc.if_else(
        pa.array(ids % SCRIPT_EVERY == 0),
        pa.scalar("<html><body>" + _SCRIPT, pa.string()),
        pa.scalar("<html><body>", pa.string()),
    )
    prefix = pc.if_else(
        pa.array(ids % STYLE_EVERY == 0),
        pc.binary_join_element_wise(prefix, pa.scalar(_STYLE), ""),
        prefix,
    )
    payload = pc.binary_join_element_wise(prefix, body, "</body></html>", "")
    return pa.table(
        {
            "conv_id": pc.cast(pa.array(ids, pa.int64()), pa.string()),
            "turn_idx": pa.array(ids.astype(np.int32), pa.int32()),
            "role": pa.array(np.full(n, "user", dtype=object), pa.string()),
            "text": payload,
        }
    )


def html_from_documents(sf_dir: str):
    """Ray Dataset of synthetic html transcripts, one per documents row
    (conv_id = str(doc_id), turn_idx = doc_id). Column-pruned,
    metadata-sized read."""
    from ..io_utils import sized_read_parquet

    ds = sized_read_parquet(
        os.path.join(sf_dir, "documents.parquet"), ["doc_id", "text"],
        rows_per_block=65536, min_blocks=8,
    )
    return ds.map_batches(
        _html_payloads, batch_format="pyarrow", zero_copy_batch=True
    )


# The expected extractor OUTPUT, derived in SQL from the same
# arithmetic (not by re-parsing the payload — the round-trip through
# the real block splitter/filters is exactly what the Ray side adds).
HTML_SQL = f"""
WITH hdocs AS (
  SELECT doc_id AS d,
         list_transform(regexp_extract_all(coalesce(text, ''), '[A-Za-z0-9]+')[1:{MAX_BLOCKS}],
                        x -> x[1:{MAX_TOKEN_CHARS}]) AS toks
  FROM documents
),
hline AS (
  SELECT d, CAST(s['i'] AS BIGINT) - 1 AS i, s['tok'] AS tok
  FROM (
    SELECT d, unnest(list_transform(toks, (x, j) -> {{'tok': x, 'i': j}})) AS s
    FROM hdocs
  )
),
hblock AS (
  -- classes 1 (link_density = 1) and 5 (<= 3 visible chars) can never
  -- pass the keep rule; the others map to their visible text + anchor
  -- chars exactly as the extractor measures them
  SELECT d, i,
         CASE (d + i) % 6
           WHEN 0 THEN repeat(tok, 8)
           WHEN 2 THEN repeat(tok, 8) || ' ok'
           WHEN 3 THEN repeat(tok, 8) || '&x'
           WHEN 4 THEN repeat(tok, 4) || ' ' || repeat(tok, 4)
         END AS vis,
         CASE (d + i) % 6 WHEN 2 THEN 2 ELSE 0 END AS anchor
  FROM hline
  WHERE (d + i) % 6 NOT IN (1, 5)
),
hkept AS (
  SELECT d, i, vis FROM hblock
  WHERE length(vis) >= 20
    AND CAST(anchor AS DOUBLE) / length(vis) <= 0.5
    AND 1.0 - CAST(anchor AS DOUBLE) / length(vis) >= 0.5
),
hagg AS (
  SELECT d, count(*) AS n_spans,
         string_agg(vis, chr(10) ORDER BY i) AS extracted_text
  FROM hkept GROUP BY d
)
SELECT doc_id, 'html' AS route,
       coalesce(a.extracted_text, '') AS extracted_text,
       'ok' AS status,
       coalesce(a.n_spans, 0) AS n_spans
FROM documents LEFT JOIN hagg a ON a.d = documents.doc_id
"""
