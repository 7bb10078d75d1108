"""The unified extractor as a Ray Data actor-pool stage.

This is the flagship stateful stage — the engine analog of the
reference's OCREngine actor (core/ocr_engine.py:193-310 model load once
per process; core/parallel_ocr.py:149-173 pool initializer): all state
(variant table, compiled regexes, config) is built ONCE per actor in
``__init__`` and reused for every batch; ``__call__`` does the per-batch
work. Use with::

    ds.map_batches(ExtractTurns, fn_constructor_kwargs={"config": cfg},
                   batch_format="pyarrow", zero_copy_batch=True,
                   batch_size=4096, concurrency=(2, 8))

Hot-path layout: the cheap routes (blank / plain / plain_long — the
majority of turns) are fully vectorized with pyarrow.compute kernels;
only payloads that genuinely need parsing (html, pdfish) drop to the
per-row pure functions, exactly like batched model inference. A
dedicated parity test (tests/test_extractor_stage.py) asserts the
vectorized output is byte-equal to the serial per-row oracle.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, ExtractorConfig
from ..functions.extract import (
    HTML_CLOSE_PATTERN,
    HTML_OPEN_PATTERN,
    LAYOUT_MARKER,
    ROUTE_BLANK,
    ROUTE_HTML,
    ROUTE_PDFISH,
    ROUTE_PLAIN,
    ROUTE_PLAIN_LONG,
    extract_turn,
)
from ..functions.variants import VariantMapper
from ..schema import SPAN_REF_TYPE, SPAN_TYPE, STATUS_OK, STATUS_SKIPPED

_BLANK_NOISE_ANCHORED = r"^[ \t\r\n\-=_~*·.•]+$"

# Per-worker-process extractor cache for the stateless-task path — the
# direct analog of the reference's module-global `_process_ocr_engine`
# built once per pool process (core/parallel_ocr.py:149-173). Keyed by
# config fingerprint so different configs coexist.
_PROCESS_EXTRACTORS: dict[tuple[str, bool], "ExtractTurns"] = {}


def extract_batch(batch: pa.Table, config=None, use_ladder: bool = False) -> pa.Table:
    """Stateless-task entry point: builds (once per worker process) and
    applies the extractor. Preferred over the actor pool when the
    per-worker state is cheap (variant dict + regexes ≈ ms): task
    scheduling is elastic and avoids actor-pool dispatch overhead. Use
    the ExtractTurns class + map_batches(concurrency=...) when state is
    genuinely heavy (real model weights)."""
    from ..config import DEFAULT_CONFIG

    cfg = config or DEFAULT_CONFIG
    key = (cfg.fingerprint(), use_ladder)
    ex = _PROCESS_EXTRACTORS.get(key)
    if ex is None:
        ex = _PROCESS_EXTRACTORS[key] = ExtractTurns(cfg, use_ladder=use_ladder)
    return ex(batch)

_R_BLANK, _R_PDFISH, _R_HTML, _R_PLAIN_LONG, _R_PLAIN = 0, 1, 2, 3, 4
_ROUTE_NAMES = {
    _R_BLANK: ROUTE_BLANK,
    _R_PDFISH: ROUTE_PDFISH,
    _R_HTML: ROUTE_HTML,
    _R_PLAIN_LONG: ROUTE_PLAIN_LONG,
    _R_PLAIN: ROUTE_PLAIN,
}


class ExtractTurns:
    """Callable-class stage: route → extract → normalize → dual-emit."""

    def __init__(
        self,
        config: ExtractorConfig = DEFAULT_CONFIG,
        use_ladder: bool = False,
    ):
        self.config = config
        # R3 degradation ladder, applied per-row on fallback (see
        # functions.extract.degraded_ladder); built once per actor.
        if use_ladder:
            from ..functions.extract import degraded_ladder

            self.ladder: tuple[ExtractorConfig, ...] = degraded_ladder(config)
        else:
            self.ladder = ()
        # span byte-thinning (config.span_text_refs): spans carry
        # (text_off, text_len) refs into extracted_text instead of a
        # duplicate text copy — see schema.SPAN_REF_TYPE
        self.span_type = SPAN_REF_TYPE if config.span_text_refs else SPAN_TYPE
        self.vm = VariantMapper(config.variants_path) if config.enable_variants else None
        if self.vm is not None and self.vm.mapping:
            # vectorized "does this row contain any variant char" probe —
            # CJK chars need no escaping inside a RE2 class
            self._variant_class = "[" + "".join(sorted(self.vm.mapping)) + "]"
        else:
            self._variant_class = None

    # -- vectorized route (same predicates as functions.extract.route_payload)
    def _route(self, text: pa.ChunkedArray | pa.Array) -> np.ndarray:
        stripped = pc.utf8_trim(text, " \t\r\n")
        empty = pc.or_kleene(pc.is_null(text), pc.equal(stripped, ""))
        noise = pc.match_substring_regex(stripped, _BLANK_NOISE_ANCHORED)
        blank = pc.or_kleene(empty, noise).fill_null(True)
        pdfish = pc.starts_with(stripped, LAYOUT_MARKER).fill_null(False)
        html = pc.and_kleene(
            pc.match_substring_regex(text, HTML_OPEN_PATTERN),
            pc.match_substring_regex(text, HTML_CLOSE_PATTERN),
        ).fill_null(False)
        long_plain = pc.greater(
            pc.utf8_length(stripped).fill_null(0), self.config.existing_text_threshold
        )
        route = np.full(len(text), _R_PLAIN, dtype=np.int8)
        route[np.asarray(long_plain)] = _R_PLAIN_LONG
        route[np.asarray(html)] = _R_HTML
        route[np.asarray(pdfish)] = _R_PDFISH
        route[np.asarray(blank)] = _R_BLANK
        return route

    def _truncate(self, arr: pa.Array) -> pa.Array:
        """Oversized-payload guard for the vectorized plain/plain_long
        paths — the same cut extract_once applies AFTER routing
        (functions/extract.py:320-323: route on the full payload, then
        slice to max_payload_chars). utf8_slice_codeunits counts code
        points, matching Python str slicing."""
        mx = self.config.max_payload_chars
        over = pc.greater(pc.utf8_length(arr), mx).fill_null(False)
        if not np.asarray(over).any():
            return arr
        return pc.if_else(over, pc.utf8_slice_codeunits(arr, 0, mx), arr)

    # -- Arrow-native per-class builders ------------------------------------
    #
    # The batch is split by route class; each class builds its columns as
    # Arrow arrays at C speed (no Python row objects for the plain /
    # passthrough / blank majority); a single permutation `take` restores
    # input row order at the end. Only html/pdfish payloads — inherently
    # per-payload parse work, like batched model inference — run Python
    # per row. Parity with the serial per-row oracle (functions.extract)
    # is pinned by tests/test_extractor_parity.py.

    def _spans_single(self, texts: pa.Array, kind: str, present: np.ndarray) -> pa.Array:
        """list<span> with one span per row where ``present`` else
        empty. Text-carrying form: span text aliases the extracted-text
        buffer (zero-copy in memory; duplicated on write). Refs form:
        (0, len) — the single span IS the whole extracted string."""
        pb = present.astype(bool)
        vals = texts.filter(pa.array(pb)) if not pb.all() else texts
        k = len(vals)
        if self.config.span_text_refs:
            text_children = [
                pa.array(np.zeros(k, np.int32), pa.int32()),
                pc.cast(pc.utf8_length(vals), pa.int32()),
            ]
        else:
            text_children = [vals]
        struct = pa.StructArray.from_arrays(
            [
                pa.array(np.zeros(k, np.int32), pa.int32()),
                pa.nulls(k, pa.string()).fill_null(kind),
                *text_children,
                pa.array(np.ones(k, np.float64), pa.float64()),
                pa.array(np.zeros(k, bool), pa.bool_()),
                pa.array(np.zeros(k, np.float64), pa.float64()),  # font_size: no geometry
            ],
            fields=list(self.span_type),
        )
        offsets = np.concatenate([[0], np.cumsum(present, dtype=np.int32)])
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)

    def _span_dicts(self, spans) -> list[dict]:
        """Parser-route span rows in the active span form. Refs form:
        offsets follow from the construction invariant extracted_text =
        '\\n'.join(span texts) for html/pdfish (functions/extract.py:
        230-232, 293-310) — each span is a contiguous code-point slice."""
        if not self.config.span_text_refs:
            return [s.to_dict() for s in spans]
        out = []
        off = 0
        for s in spans:
            ln = len(s.text)
            out.append(
                {
                    "span_idx": s.span_idx,
                    "kind": s.kind,
                    "text_off": off,
                    "text_len": ln,
                    "score": s.score,
                    "vertical": s.vertical,
                    "font_size": s.font_size,
                }
            )
            off += ln + 1
        return out

    @staticmethod
    def _const(value: str, k: int) -> pa.Array:
        return pa.nulls(k, pa.string()).fill_null(value)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # upstream kernels may widen utf8 → large_utf8 (e.g. the polars
        # sort path); pin the canonical narrow types so span-struct
        # children and cross-path unions stay type-stable
        for name in ("conv_id", "role", "text"):
            i = batch.schema.get_field_index(name)
            if i >= 0 and batch.column(name).type == pa.large_string():
                batch = batch.set_column(
                    i, name, batch.column(name).cast(pa.string())
                )
        text = batch.column("text").combine_chunks()
        route = self._route(text)

        idx_parts: list[np.ndarray] = []
        col_parts: dict[str, list[pa.Array]] = {
            "route": [], "extracted_text": [], "spans": [], "status": [], "error": []
        }

        def emit(idxs, route_arr, ext_arr, spans_arr, status_arr, err_arr):
            idx_parts.append(idxs)
            col_parts["route"].append(route_arr)
            col_parts["extracted_text"].append(ext_arr)
            col_parts["spans"].append(spans_arr)
            col_parts["status"].append(status_arr)
            col_parts["error"].append(err_arr)

        # --- blank rows: empty text, skipped, no spans
        blank_idx = np.flatnonzero(route == _R_BLANK)
        if len(blank_idx):
            k = len(blank_idx)
            empty = self._const("", k)
            emit(
                blank_idx,
                self._const(ROUTE_BLANK, k),
                empty,
                self._spans_single(empty, ROUTE_PLAIN, np.zeros(k, np.int64)),
                self._const(STATUS_SKIPPED, k),
                pa.nulls(k, pa.string()),
            )

        # --- long-plain passthrough: payload emitted unchanged
        long_idx = np.flatnonzero(route == _R_PLAIN_LONG)
        if len(long_idx):
            k = len(long_idx)
            ext = self._truncate(text.take(pa.array(long_idx)))
            emit(
                long_idx,
                self._const(ROUTE_PLAIN_LONG, k),
                ext,
                self._spans_single(ext, ROUTE_PLAIN_LONG, np.ones(k, np.int64)),
                self._const(STATUS_OK, k),
                pa.nulls(k, pa.string()),
            )

        # --- short plain: NFKC(strip). pyarrow's utf8proc NFKC differs
        # from Python's unicodedata on recomposition (e.g. ㌀ → ア + パ
        # decomposed instead of アパート) and the determinism contract is
        # pinned to unicodedata — so Arrow trims, ASCII rows (NFKC =
        # identity) stay vectorized, only non-ASCII rows pay Python.
        plain_idx = np.flatnonzero(route == _R_PLAIN)
        if len(plain_idx):
            k = len(plain_idx)
            sub = pc.utf8_trim_whitespace(self._truncate(text.take(pa.array(plain_idx))))
            is_ascii = np.asarray(pc.string_is_ascii(sub))
            if not is_ascii.all():
                nonascii_rel = np.flatnonzero(~is_ascii)
                fixed = [
                    unicodedata.normalize("NFKC", v)
                    for v in sub.take(pa.array(nonascii_rel)).to_pylist()
                ]
                # scatter the normalized minority back (strings lack
                # replace_with_mask — rebuild via class-split + take)
                order = np.concatenate([np.flatnonzero(is_ascii), nonascii_rel])
                merged = pa.concat_arrays(
                    [sub.filter(pa.array(is_ascii)), pa.array(fixed, pa.string())]
                )
                inv = np.empty(k, np.int64)
                inv[order] = np.arange(k)
                sub = merged.take(pa.array(inv))
            nonempty = np.asarray(pc.not_equal(sub, "")).astype(np.int64)
            status_arr = (
                self._const(STATUS_OK, k)
                if nonempty.all()
                else pa.array(
                    np.where(nonempty.astype(bool), STATUS_OK, STATUS_SKIPPED)
                ).cast(pa.string())
            )
            emit(
                plain_idx,
                self._const(ROUTE_PLAIN, k),
                sub,
                self._spans_single(sub, ROUTE_PLAIN, nonempty),
                status_arr,
                pa.nulls(k, pa.string()),
            )

        # --- parser routes: per-row pure functions (inherent per-payload
        # work, like batched model inference)
        parse_idx = np.flatnonzero((route == _R_HTML) | (route == _R_PDFISH))
        if len(parse_idx):
            sub_py = text.take(pa.array(parse_idx)).to_pylist()
            # within-batch payload dedup: extraction is a pure function
            # of the payload, so identical payloads (boilerplate turns —
            # ~20% of parse rows in the synthetic corpus, often far more
            # in real web/transcript data) parse ONCE and fan out via an
            # Arrow take. Exactly byte-equal to parsing every row.
            uniq_index: dict[str, int] = {}
            inv_parse = np.empty(len(sub_py), np.int64)
            payloads: list[str] = []
            for i, p in enumerate(sub_py):
                j = uniq_index.setdefault(p, len(payloads))
                if j == len(payloads):
                    payloads.append(p)
                inv_parse[i] = j
            if self.ladder:
                from ..functions.extract import extract_turn_ladder

                def _do(payload):
                    return extract_turn_ladder(payload, self.config, self.ladder, None)

            else:

                def _do(payload):
                    return extract_turn(payload, self.config, None)

            p_route: list[str] = []
            p_ext: list[str] = []
            p_spans: list[list[dict]] = []
            p_status: list[str] = []
            p_err: list[str | None] = []
            for payload in payloads:
                ext, _ = _do(payload)
                p_route.append(ext.route)  # 'error' when the payload poisoned
                p_ext.append(ext.extracted_text)
                p_spans.append(self._span_dicts(ext.spans))
                p_status.append(ext.status)
                p_err.append(ext.error)
            fan = pa.array(inv_parse)
            emit(
                parse_idx,
                pa.array(p_route, pa.string()).take(fan),
                pa.array(p_ext, pa.string()).take(fan),
                pa.array(p_spans, pa.list_(self.span_type)).take(fan),
                pa.array(p_status, pa.string()).take(fan),
                pa.array(p_err, pa.string()).take(fan),
            )

        # --- assemble: one permutation take restores input order
        concat_idx = np.concatenate(idx_parts)
        inv = np.empty(n, np.int64)
        inv[concat_idx] = np.arange(n)
        perm = pa.array(inv)
        cols = {
            name: pa.concat_arrays(parts).take(perm)
            for name, parts in col_parts.items()
        }

        # --- variant dual emission over ok rows (vectorized probe,
        #     per-matching-row translate; core/pdf_processor.py:661-665)
        normalized: pa.Array = pa.nulls(n, pa.string())
        if self._variant_class is not None:
            has_variant = np.asarray(
                pc.match_substring_regex(cols["extracted_text"], self._variant_class)
                .fill_null(False)
            )
            hit_mask = has_variant & np.asarray(pc.equal(cols["status"], STATUS_OK))
            if self.ladder:
                # rows recovered via a degraded rung carry
                # error='degraded[k]: ...' and the serial ladder path
                # (extract_turn_ladder) emits normalized=None for them —
                # keep the two paths byte-equal by excluding them here
                not_degraded = pc.invert(
                    pc.starts_with(cols["error"], "degraded[").fill_null(False)
                )
                hit_mask &= np.asarray(not_degraded)
            hit = np.flatnonzero(hit_mask)
            if len(hit):
                norm_py: list[str | None] = [None] * n
                originals = cols["extracted_text"].take(pa.array(hit)).to_pylist()
                for i, orig in zip(hit, originals):
                    cand = self.vm.normalize(orig)
                    if cand != orig:
                        norm_py[i] = cand
                normalized = pa.array(norm_py, pa.string())

        # key + provenance passthrough (`tool` rides along when present —
        # the input_hint's text/tool payload pair; like the reference
        # keeping the original page image next to the text layer)
        passthrough = [
            c for c in ("conv_id", "turn_idx", "role", "tool") if c in batch.schema.names
        ]
        return pa.Table.from_arrays(
            [batch.column(c) for c in passthrough]
            + [
                cols["route"],
                cols["extracted_text"],
                normalized,
                cols["spans"],
                cols["status"],
                cols["error"],
            ],
            names=passthrough
            + [
                "route",
                "extracted_text",
                "text_normalized",
                "spans",
                "status",
                "error",
            ],
        )
