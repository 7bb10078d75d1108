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
from ..schema import SPAN_TYPE, STATUS_OK, STATUS_SKIPPED

_BLANK_NOISE_ANCHORED = r"^[ \t\r\n\-=_~*·.•]+$"

# Per-worker-process extractor cache for the stateless-task path — the
# direct analog of the reference's module-global `_process_ocr_engine`
# built once per pool process (core/parallel_ocr.py:149-173). Keyed by
# config fingerprint so different configs coexist.
_PROCESS_EXTRACTORS: dict[str, "ExtractTurns"] = {}


def extract_batch(batch: pa.Table, config=None) -> pa.Table:
    """Stateless-task entry point: builds (once per worker process) and
    applies the extractor. Preferred over the actor pool when the
    per-worker state is cheap (variant dict + regexes ≈ ms): task
    scheduling is elastic and avoids actor-pool dispatch overhead. Use
    the ExtractTurns class + map_batches(concurrency=...) when state is
    genuinely heavy (real model weights)."""
    from ..config import DEFAULT_CONFIG

    cfg = config or DEFAULT_CONFIG
    key = cfg.fingerprint()
    ex = _PROCESS_EXTRACTORS.get(key)
    if ex is None:
        ex = _PROCESS_EXTRACTORS[key] = ExtractTurns(cfg)
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

    def __init__(self, config: ExtractorConfig = DEFAULT_CONFIG):
        self.config = config
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch.column("text").combine_chunks()
        route = self._route(text)

        extracted: list[str | None] = [None] * n
        normalized: list[str | None] = [None] * n
        spans: list[list[dict] | None] = [None] * n
        status: list[str] = [STATUS_OK] * n
        error: list[str | None] = [None] * n

        # --- vectorized plain path: NFKC(strip) for the short-plain rows.
        # NOTE: pyarrow's utf8proc NFKC differs from Python's unicodedata
        # on recomposition (e.g. ㌀ → ア + ハ + U+309A instead of アパート),
        # and the determinism contract is pinned to unicodedata. So: Arrow
        # trims + detects ASCII (NFKC is identity on ASCII → vectorized
        # fast path); only non-ASCII rows pay the per-row normalize.
        plain_mask = route == _R_PLAIN
        if plain_mask.any():
            idxs = np.flatnonzero(plain_mask)
            sub = pc.utf8_trim_whitespace(text.take(pa.array(idxs)))
            is_ascii = np.asarray(pc.string_is_ascii(sub))
            norm_py = sub.to_pylist()
            for j in np.flatnonzero(~is_ascii):
                norm_py[j] = unicodedata.normalize("NFKC", norm_py[j])
            for j, i in enumerate(idxs):
                s = norm_py[j]
                if not s:
                    status[i] = STATUS_SKIPPED
                    extracted[i] = ""
                    spans[i] = []
                else:
                    extracted[i] = s
                    spans[i] = [
                        {"span_idx": 0, "kind": ROUTE_PLAIN, "text": s, "score": 1.0, "vertical": False}
                    ]

        # --- vectorized passthrough: long plain text emitted unchanged
        long_mask = route == _R_PLAIN_LONG
        if long_mask.any():
            idxs = np.flatnonzero(long_mask)
            sub_py = text.take(pa.array(idxs)).to_pylist()
            for j, i in enumerate(idxs):
                s = sub_py[j]
                extracted[i] = s
                spans[i] = [
                    {"span_idx": 0, "kind": ROUTE_PLAIN_LONG, "text": s, "score": 1.0, "vertical": False}
                ]

        # --- blank rows
        blank_mask = route == _R_BLANK
        if blank_mask.any():
            for i in np.flatnonzero(blank_mask):
                status[i] = STATUS_SKIPPED
                extracted[i] = ""
                spans[i] = []

        # --- parser routes: per-row pure functions (inherent per-payload work)
        route_name: list[str] = [_ROUTE_NAMES[r] for r in route]
        parse_mask = (route == _R_HTML) | (route == _R_PDFISH)
        if parse_mask.any():
            idxs = np.flatnonzero(parse_mask)
            sub_py = text.take(pa.array(idxs)).to_pylist()
            for j, i in enumerate(idxs):
                ext, norm_text = extract_turn(sub_py[j], self.config, None)
                extracted[i] = ext.extracted_text
                spans[i] = [s.to_dict() for s in ext.spans]
                status[i] = ext.status
                error[i] = ext.error
                normalized[i] = norm_text
                route_name[i] = ext.route  # 'error' when the payload poisoned

        # --- variant dual emission over ok rows (vectorized probe,
        #     per-matching-row translate; core/pdf_processor.py:661-665)
        if self._variant_class is not None:
            ext_arr = pa.array(extracted, pa.string())
            has_variant = pc.match_substring_regex(ext_arr, self._variant_class)
            for i in np.flatnonzero(np.asarray(has_variant.fill_null(False))):
                if status[i] == STATUS_OK and extracted[i]:
                    cand = self.vm.normalize(extracted[i])
                    if cand != extracted[i]:
                        normalized[i] = cand

        return pa.Table.from_arrays(
            [
                batch.column("conv_id"),
                batch.column("turn_idx"),
                batch.column("role"),
                pa.array(route_name, pa.string()),
                pa.array(extracted, pa.string()),
                pa.array(normalized, pa.string()),
                pa.array(spans, pa.list_(SPAN_TYPE)),
                pa.array(status, pa.string()),
                pa.array(error, pa.string()),
            ],
            names=[
                "conv_id",
                "turn_idx",
                "role",
                "route",
                "extracted_text",
                "text_normalized",
                "spans",
                "status",
                "error",
            ],
        )
