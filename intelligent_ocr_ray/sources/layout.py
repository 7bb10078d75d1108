"""documents → deterministic pdfish layout payloads (SQL-expressible).

The driver's tables carry no native ``%LAYOUT`` payloads, so the pdfish
branch of the extractor — the engine analog of the reference's
coordinate-span OCR output parse (core/pdf_processor.py:617-659) — was
the one flagship surface without a DuckDB oracle. This source closes
that gap: it derives a layout payload from every ``documents`` row with
pure integer/string arithmetic that DuckDB replays verbatim
(``LAYOUT_SQL``), then the REAL Ray extractor round-trips the payload
through the actual ``%LAYOUT`` grammar parser, confidence filter,
vertical/horizontal segmentation and reading-order reconstruction — and
the oracle derives the expected output directly from the same
arithmetic. Any parser/sort/filter bug shows up as a hash mismatch.

Derivation contract (keep in lockstep with ``LAYOUT_SQL``):

* tokens = printable-ASCII runs ``[!-~]+`` of the doc text, first 16,
  each truncated to 40 chars (ASCII ⇒ NFKC-invariant, so the
  normalize step is the identity on both engines);
* line i (0-based) for doc d:
    x0 = (7d+13i) % 90,  w = 1 + (5d+3i) % 40,  x1 = x0 + w
    y0 = (3d+17i) % 120, h = 1 + (11d+7i) % 80, y1 = y0 + h
    conf = '0.' || lpad((d+29i) % 100, 2, '0')
    txt  = '' when (d+i) % 11 == 0 else token   (empty-span drop path)
  rendered ``x0,y0,x1,y1,conf|txt``;
* docs with d % 37 == 0 and ≥1 line get a trailing malformed line
  ``???`` — the strict parse fails and the R3 degradation ladder's
  lenient rung must recover the doc (status stays 'ok');
* payload = '%LAYOUT' + newline-joined lines.

Exercised downstream (all oracle-checked): conf >= 0.5 keep, empty-text
span drop, vertical iff h > 2w, horizontal (y0, x0, i) then vertical
(-x1, y0, i) reading order, newline join, ladder recovery.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_LINES = 16
MAX_TOKEN_CHARS = 40
MALFORMED_EVERY = 37
EMPTY_TXT_EVERY = 11


def _layout_payloads(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (conv_id, turn_idx, role, text=payload) — fully
    vectorized: one regex split, integer numpy coordinate math, Arrow
    element-wise joins; no per-row Python."""
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    # turn_idx is int32 by the transcript schema; a wrapped id would
    # silently corrupt the doc_id the oracle joins on (the query casts
    # turn_idx back to int64) — refuse rather than mismatch
    if len(ids) and ids.max() >= 2**31:
        raise ValueError(
            "layout oracle corpus requires doc_id < 2^31 (turn_idx is int32)"
        )
    n = len(ids)
    toks_list = pc.split_pattern_regex(
        pc.coalesce(batch.column("text"), pa.scalar("", pa.string())), "[^!-~]+"
    )
    if isinstance(toks_list, pa.ChunkedArray):
        toks_list = toks_list.combine_chunks()
    flat = toks_list.flatten()
    row_of = np.repeat(
        np.arange(n, dtype=np.int64),
        np.asarray(pc.list_value_length(toks_list), dtype=np.int64),
    )
    # regex SPLIT emits '' at run boundaries where findall would not —
    # drop them, then keep the first MAX_LINES tokens per row
    keep = np.asarray(pc.greater(pc.utf8_length(flat), 0)).astype(bool)
    flat = flat.filter(pa.array(keep))
    row_of = row_of[keep]
    starts = np.searchsorted(row_of, np.arange(n, dtype=np.int64))
    pos = np.arange(len(row_of), dtype=np.int64) - starts[row_of]
    keep16 = pos < MAX_LINES
    tok = pc.utf8_slice_codeunits(flat.filter(pa.array(keep16)), 0, MAX_TOKEN_CHARS)
    row_of = row_of[keep16]
    i = pos[keep16]

    d = ids[row_of]
    x0 = (7 * d + 13 * i) % 90
    w = 1 + (5 * d + 3 * i) % 40
    y0 = (3 * d + 17 * i) % 120
    h = 1 + (11 * d + 7 * i) % 80
    c = (d + 29 * i) % 100
    conf = pc.utf8_lpad(pc.cast(pa.array(c, pa.int64()), pa.string()), 2, "0")
    txt = pc.if_else(
        pa.array((d + i) % EMPTY_TXT_EVERY == 0), pa.scalar("", pa.string()), tok
    )

    def s(arr):
        return pc.cast(pa.array(arr, pa.int64()), pa.string())

    lines = pc.binary_join_element_wise(
        s(x0), ",", s(y0), ",", s(x0 + w), ",", s(y0 + h), ",0.", conf, "|", txt, ""
    )

    # trailing malformed line for the ladder-recovery docs
    n_lines = np.zeros(n, dtype=np.int64)
    np.add.at(n_lines, row_of, 1)
    bad_rows = np.flatnonzero((ids % MALFORMED_EVERY == 0) & (n_lines > 0))
    if len(bad_rows):
        lines = pa.concat_arrays(
            [lines.combine_chunks() if isinstance(lines, pa.ChunkedArray) else lines,
             pa.array(["???"] * len(bad_rows), pa.string())]
        )
        row_of = np.concatenate([row_of, bad_rows])
        i = np.concatenate([i, np.full(len(bad_rows), 1 << 30, dtype=np.int64)])
        order = np.lexsort((i, row_of))
        lines = lines.take(pa.array(order))
        row_of = row_of[order]
        n_lines[bad_rows] += 1

    offsets = np.concatenate([[0], np.cumsum(n_lines)]).astype(np.int32)
    body = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), lines),
        "\n",
    )
    payload = pc.if_else(
        pa.array(n_lines > 0),
        pc.binary_join_element_wise(pa.scalar("%LAYOUT"), body, "\n"),
        pa.scalar("%LAYOUT", pa.string()),
    )
    return pa.table(
        {
            "conv_id": pc.cast(pa.array(ids, pa.int64()), pa.string()),
            "turn_idx": pa.array(ids.astype(np.int32), pa.int32()),
            "role": pa.array(np.full(n, "user", dtype=object), pa.string()),
            "text": payload,
        }
    )


def layout_from_documents(sf_dir: str):
    """Ray Dataset of synthetic pdfish transcripts, one per documents
    row (conv_id = str(doc_id), turn_idx = doc_id). Column-pruned,
    metadata-sized read."""
    from ..io_utils import sized_read_parquet

    ds = sized_read_parquet(
        os.path.join(sf_dir, "documents.parquet"), ["doc_id", "text"],
        rows_per_block=65536, min_blocks=8,
    )
    return ds.map_batches(
        _layout_payloads, batch_format="pyarrow", zero_copy_batch=True
    )


# The expected extractor OUTPUT, derived in SQL from the same integer
# arithmetic (not by re-parsing the payload string — the round-trip
# through the real grammar parser is exactly what the Ray side adds,
# and what a hash mismatch would catch).
LAYOUT_SQL = f"""
WITH ldocs AS (
  SELECT doc_id AS d,
         list_transform(regexp_extract_all(coalesce(text, ''), '[!-~]+')[1:{MAX_LINES}],
                        x -> x[1:{MAX_TOKEN_CHARS}]) AS toks
  FROM documents
),
lline AS (
  -- (x, j) lambda: j is the 1-based list index → i = j - 1
  SELECT d, CAST(s['i'] AS BIGINT) - 1 AS i, s['tok'] AS tok
  FROM (
    SELECT d, unnest(list_transform(toks, (x, j) -> {{'tok': x, 'i': j}})) AS s
    FROM ldocs
  )
),
lspan AS (
  SELECT d, i,
         (7*d + 13*i) % 90 AS x0,
         1 + (5*d + 3*i) % 40 AS w,
         (3*d + 17*i) % 120 AS y0,
         1 + (11*d + 7*i) % 80 AS h,
         (d + 29*i) % 100 AS c,
         CASE WHEN (d + i) % {EMPTY_TXT_EVERY} = 0 THEN '' ELSE tok END AS txt
  FROM lline
),
lkept AS (
  SELECT d, i, txt, h > 2*w AS vert, x0 + w AS x1, x0, y0
  FROM lspan WHERE c >= 50 AND txt <> ''
),
lagg AS (
  SELECT d, count(*) AS n_spans,
         string_agg(txt, chr(10) ORDER BY vert,
                    CASE WHEN vert THEN -x1 ELSE y0 END,
                    CASE WHEN vert THEN y0 ELSE x0 END, i) AS extracted_text
  FROM lkept GROUP BY d
)
SELECT doc_id, 'pdfish' AS route,
       coalesce(a.extracted_text, '') AS extracted_text,
       'ok' AS status,
       coalesce(a.n_spans, 0) AS n_spans
FROM documents LEFT JOIN lagg a ON a.d = documents.doc_id
"""
