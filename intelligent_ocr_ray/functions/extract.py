"""The unified per-turn extractor: pure, deterministic functions.

This is the engine analog of the reference's per-page OCR core
(core/pdf_processor.py render→recognize→filter→normalize→insert chain,
core/ocr_engine.py:312-372), re-targeted at transcript turn payloads:

* route sniff  — which extractor handles the payload (render/format
  detection analog, core/pdf_processor.py:878-907);
* blank detect — noise-only payloads are skipped
  (blank-page edge-magnitude detector, core/pdf_processor.py:763-794);
* existing-text passthrough — long plain text is emitted unchanged
  (page-level "already searchable" skip, core/pdf_processor.py:527-531);
* HTML boilerplate strip — link-density + text-density block filter;
* PDF-ish layout parse — coordinate spans, vertical/horizontal
  segmentation (core/pdf_processor.py:649-659) and reading-order
  reconstruction (insertion-order semantics, core/pdf_processor.py:1465-1472);
* span confidence filter (min_confidence 0.5, core/pdf_processor.py:627-629);
* NFKC normalize + strip, drop-if-empty (core/pdf_processor.py:631-633);
* variant dual emission (core/pdf_processor.py:661-665);
* bounded retry + fallback-to-original — never drop a turn
  (core/pdf_processor.py:1170-1212).

DETERMINISM CONTRACT: every function here is a pure function of
(text, config, variant table). The Ray pipeline and the serial oracle
both call exactly these functions, so per-turn outputs are byte-equal by
construction; ordering is imposed separately (pipelines/ordering.py).

ROUTE-SNIFF SQL PARITY: the route predicates below are deliberately
written with RE2-compatible, ASCII-whitespace-only regexes so that the
same route decision can be re-expressed in DuckDB SQL for the driver's
oracle on the SQL-checkable branches (see __ray_entry__.py).
"""

from __future__ import annotations

import html as _html
import re
import unicodedata
from dataclasses import dataclass, field

from ..config import ExtractorConfig
from ..schema import STATUS_FALLBACK, STATUS_OK, STATUS_SKIPPED
from .variants import VariantMapper

# --- route sniffing -------------------------------------------------------

# ASCII whitespace only (RE2/SQL parity; see module docstring).
_WS = " \t\r\n"

LAYOUT_MARKER = "%LAYOUT"

# Noise-only payloads (separator lines etc.) are "blank pages".
_BLANK_NOISE_RE = re.compile(r"^[ \t\r\n\-=_~*·.•]+$")

# Case-sensitive lowercase-tag sniff; both an opening and a closing
# block/inline tag must be present. Kept simple so the identical regex
# runs under DuckDB's RE2.
HTML_OPEN_PATTERN = (
    r"<(p|div|a|li|ul|ol|nav|footer|header|span|h[1-6]|body|html|br|"
    r"table|td|tr|section|article|aside|title)[ >]"
)
HTML_CLOSE_PATTERN = (
    r"</(p|div|a|li|ul|ol|nav|footer|header|span|h[1-6]|body|html|"
    r"table|td|tr|section|article|aside|title)>"
)
_HTML_OPEN_RE = re.compile(HTML_OPEN_PATTERN)
_HTML_CLOSE_RE = re.compile(HTML_CLOSE_PATTERN)

ROUTE_BLANK = "blank"
ROUTE_PDFISH = "pdfish"
ROUTE_HTML = "html"
ROUTE_PLAIN = "plain"
ROUTE_PLAIN_LONG = "plain_long"


def route_payload(text: str | None, config: ExtractorConfig) -> str:
    """Decide which extractor handles a payload. Deterministic; order of
    checks is part of the contract (blank > pdfish > html > plain)."""
    if text is None:
        return ROUTE_BLANK
    stripped = text.strip(_WS)
    if not stripped or _BLANK_NOISE_RE.match(stripped):
        return ROUTE_BLANK
    if stripped.startswith(LAYOUT_MARKER):
        return ROUTE_PDFISH
    if _HTML_OPEN_RE.search(text) and _HTML_CLOSE_RE.search(text):
        return ROUTE_HTML
    if len(stripped) > config.existing_text_threshold:
        return ROUTE_PLAIN_LONG
    return ROUTE_PLAIN


# --- span model -----------------------------------------------------------


@dataclass
class Span:
    span_idx: int
    kind: str
    text: str
    score: float
    vertical: bool = False
    font_size: float = 0.0  # M12: 0.0 for text-only routes (no geometry)

    def to_dict(self) -> dict:
        return {
            "span_idx": self.span_idx,
            "kind": self.kind,
            "text": self.text,
            "score": self.score,
            "vertical": self.vertical,
            "font_size": self.font_size,
        }


@dataclass
class Extraction:
    route: str
    extracted_text: str
    spans: list[Span] = field(default_factory=list)
    status: str = STATUS_OK
    error: str | None = None


class ExtractError(ValueError):
    """Raised on malformed payloads; triggers the retry/fallback ladder."""


# --- normalization --------------------------------------------------------


def nfkc_strip(text: str) -> str:
    """NFKC-normalize then strip — same op order as the reference
    (core/pdf_processor.py:631: normalize('NFKC', text.strip()))."""
    return unicodedata.normalize("NFKC", text.strip())


_WS_COLLAPSE_RE = re.compile(r"[ \t\r\n]+")


def collapse_ws(text: str) -> str:
    return _WS_COLLAPSE_RE.sub(" ", text).strip(_WS)


# --- plain extractor ------------------------------------------------------


def extract_plain(text: str, config: ExtractorConfig) -> Extraction:
    """Short plain text: NFKC + strip; empty after normalize → skipped
    (drop-if-empty, core/pdf_processor.py:632-633)."""
    normalized = nfkc_strip(text)
    if not normalized:
        return Extraction(ROUTE_PLAIN, "", [], STATUS_SKIPPED)
    return Extraction(
        ROUTE_PLAIN,
        normalized,
        [Span(0, ROUTE_PLAIN, normalized, 1.0)],
    )


def extract_plain_long(text: str, config: ExtractorConfig) -> Extraction:
    """Existing-text passthrough: the payload is emitted UNCHANGED
    (page-copy semantics, core/pdf_processor.py:529,1500)."""
    return Extraction(
        ROUTE_PLAIN_LONG,
        text,
        [Span(0, ROUTE_PLAIN_LONG, text, 1.0)],
    )


# --- HTML extractor -------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1>", re.S)
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|li|ul|ol|nav|footer|header|h[1-6]|table|tr|td|br|"
    r"section|article|aside|body|html|head|title)\b[^>]*/?>"
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S)
_ANY_TAG_RE = re.compile(r"<[^>]*>")


def _visible_text(fragment: str) -> str:
    # cheap substring guards: most fragments have no tags/entities, and
    # skipping the regex/unescape passes halves the per-block cost
    if "<" in fragment:
        fragment = _ANY_TAG_RE.sub("", fragment)
    if "&" in fragment:
        fragment = _html.unescape(fragment)
    return collapse_ws(fragment)


def extract_html(text: str, config: ExtractorConfig) -> Extraction:
    """Boilerplate strip via link-density + text-density over block-level
    segments (the classic boilerpipe/jusText-style heuristic, re-derived
    from its public description — no DOM library needed).

    1. drop <script>/<style> subtrees;
    2. split on block-level tags into candidate blocks;
    3. per block: visible chars, anchor-visible chars,
       link_density = anchor_chars / visible_chars;
    4. keep blocks with >= html_min_block_chars visible chars, link
       density <= html_max_link_density and block score
       (1 - link_density) >= min_confidence (the span confidence filter,
       core/pdf_processor.py:627-629);
    5. NFKC each surviving block; join with '\\n' in document order.
    """
    body = _SCRIPT_STYLE_RE.sub("", text)
    spans: list[Span] = []
    out_parts: list[str] = []
    for segment in _BLOCK_TAG_RE.split(body):
        visible = _visible_text(segment)
        if not visible:
            continue
        anchor_chars = (
            sum(len(_visible_text(m)) for m in _ANCHOR_RE.findall(segment))
            if "<a" in segment
            else 0
        )
        link_density = anchor_chars / len(visible)
        score = 1.0 - link_density
        if (
            len(visible) < config.html_min_block_chars
            or link_density > config.html_max_link_density
            or score < config.min_confidence
        ):
            continue
        block_text = nfkc_strip(visible)
        if not block_text:
            continue
        spans.append(Span(len(spans), "html_block", block_text, score))
        out_parts.append(block_text)
    extracted = "\n".join(out_parts)
    return Extraction(ROUTE_HTML, extracted, spans, STATUS_OK)


# --- PDF-ish layout extractor ---------------------------------------------

# Grammar: first line '%LAYOUT'; every following non-empty line is
#   x0,y0,x1,y1,conf|text
# with floats for coordinates/confidence. Any malformed line poisons the
# whole payload (ExtractError → retry → fallback), mirroring the
# reference's per-page OCR failure path (core/pdf_processor.py:1195-1212).
_LAYOUT_LINE_RE = re.compile(
    r"^\s*(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?),"
    r"(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)\|(.*)$"
)


def extract_pdfish(text: str, config: ExtractorConfig) -> Extraction:
    """Parse a synthetic layout dump and reconstruct reading order.

    Vertical span iff height > vertical_aspect × width
    (core/pdf_processor.py:649-659: rect_height > rect_width*2).
    Reading order (deterministic contract):
      horizontal spans by (y0, x0, input order) — top-to-bottom,
      left-to-right; then vertical columns by (-x1, y0, input order) —
      right-to-left, top-to-bottom (vertical-CJK column flow,
      core/pdf_processor.py:669-681 rotate-270 insertion analog).
    Confidence filter before normalization, as in the reference
    (core/pdf_processor.py:627-633). Empty-after-NFKC spans dropped.
    """
    stripped = text.strip(_WS)
    lines = stripped.split("\n")
    if not lines or lines[0].strip(_WS) != LAYOUT_MARKER:
        raise ExtractError("pdfish payload missing %LAYOUT header")
    # plain tuples (x0, y0, x1, y1, conf, text, idx) — the dataclass
    # form measured ~20% of the parser's time in allocation alone
    min_conf = config.min_confidence
    aspect = config.vertical_aspect
    horizontal: list[tuple] = []
    vertical_cols: list[tuple] = []
    for i, line in enumerate(lines[1:]):
        if not line.strip(_WS):
            continue
        m = _LAYOUT_LINE_RE.match(line)
        if m is None:
            if config.lenient_layout:
                continue  # degraded profile: lose the line, save the turn
            raise ExtractError(f"malformed layout line {i + 1}: {line[:80]!r}")
        g0, g1, g2, g3, g4, txt = m.groups()
        conf = float(g4)
        if conf < min_conf:
            continue
        x0, y0, x1, y1 = float(g0), float(g1), float(g2), float(g3)
        if (y1 - y0) > aspect * (x1 - x0):
            vertical_cols.append((-x1, y0, i, conf, txt, True, x1 - x0, y1 - y0))
        else:
            horizontal.append((y0, x0, i, conf, txt, False, x1 - x0, y1 - y0))

    horizontal.sort(key=lambda t: t[:3])
    vertical_cols.sort(key=lambda t: t[:3])

    spans: list[Span] = []
    parts: list[str] = []
    for _, _, _, conf, raw, vert, w, h in horizontal + vertical_cols:
        norm = nfkc_strip(raw)
        if not norm:
            continue
        # M12 font-size metric (core/pdf_processor.py:652-659): vertical
        # min(w*0.9, h/chars*0.9); horizontal min(h*0.9, w/chars*1.5);
        # clamped to [4, 72]
        chars = max(len(norm), 1)
        if vert:
            fs = min(w * 0.9, h / chars * 0.9)
        else:
            fs = min(h * 0.9, w / chars * 1.5)
        fs = min(max(fs, 4.0), 72.0)
        spans.append(Span(len(spans), "pdfish_line", norm, conf, vert, fs))
        parts.append(norm)
    return Extraction(ROUTE_PDFISH, "\n".join(parts), spans, STATUS_OK)


# --- unified entry point --------------------------------------------------


def extract_once(text: str | None, config: ExtractorConfig) -> Extraction:
    route = route_payload(text, config)
    if route == ROUTE_BLANK:
        return Extraction(ROUTE_BLANK, "", [], STATUS_SKIPPED)
    assert text is not None
    if len(text) > config.max_payload_chars:
        # oversized-payload guard (adaptive-zoom analog,
        # core/pdf_processor.py:796-836): truncate, record nothing fatal.
        text = text[: config.max_payload_chars]
    if route == ROUTE_PDFISH:
        return extract_pdfish(text, config)
    if route == ROUTE_HTML:
        return extract_html(text, config)
    if route == ROUTE_PLAIN_LONG:
        return extract_plain_long(text, config)
    return extract_plain(text, config)


def extract_turn(
    text: str | None,
    config: ExtractorConfig,
    variant_mapper: VariantMapper | None = None,
) -> tuple[Extraction, str | None]:
    """Extract one turn with bounded retry + fallback; never raises.
    Returns ``(extraction, text_normalized)`` where ``text_normalized``
    is the variant-canonical form, or None when the variant map changes
    nothing (dual-emission semantics, core/pdf_processor.py:661-665).

    Retry ladder (core/pdf_processor.py:1195-1212): up to
    1 + retry_limit attempts (the leaf functions are deterministic so
    retries exist for semantic parity and for transient faults in
    subclassed extractors); on exhaustion emit the ORIGINAL payload with
    status='fallback' and the error recorded
    (core/pdf_processor.py:1170-1193), or empty text when fallback copy
    is disabled.
    """
    last_err: Exception | None = None
    result: Extraction | None = None
    for _attempt in range(1 + config.retry_limit):
        try:
            result = extract_once(text, config)
            break
        except ExtractError as e:
            # deterministic parse failure: retrying the same pure
            # function cannot succeed — go straight to fallback (the
            # reference retries because its OCR engine is stochastic,
            # core/pdf_processor.py:1195-1212; ours is not)
            last_err = e
            break
        except Exception as e:  # noqa: BLE001 — the ladder must catch everything
            last_err = e
    if result is None:
        original = (text if text is not None else "") if config.allow_fallback_copy else ""
        err = f"{type(last_err).__name__}: {last_err}"
        return Extraction("error", original, [], STATUS_FALLBACK, err), None

    normalized: str | None = None
    if (
        variant_mapper is not None
        and config.enable_variants
        and result.status == STATUS_OK
        and result.extracted_text
        and variant_mapper.needs_normalization(result.extracted_text)
    ):
        candidate = variant_mapper.normalize(result.extracted_text)
        if candidate != result.extracted_text:
            normalized = candidate
    return result, normalized


# Default degradation ladder (R3 analog): progressively more lenient /
# lower-fidelity profiles. The reference reruns whole *tasks* with
# degraded profiles (desktop/workers.py:290-307: single-process, fast
# mode, DPI−100); laddering per ROW inside the same pass is the Ray
# equivalent — no second scan over the corpus, only failed rows pay.
def degraded_ladder(base: "ExtractorConfig") -> tuple["ExtractorConfig", ...]:
    import dataclasses

    return (
        dataclasses.replace(base, lenient_layout=True),
        dataclasses.replace(
            base, lenient_layout=True, min_confidence=0.0, enable_variants=False
        ),
    )


def extract_turn_ladder(
    text: str | None,
    config: ExtractorConfig,
    ladder: tuple[ExtractorConfig, ...],
    variant_mapper: VariantMapper | None = None,
) -> tuple[Extraction, str | None]:
    """extract_turn, then on fallback walk the degraded ladder. A rung
    that succeeds emits status='ok' with the recovery recorded in
    ``error`` (``degraded[k]: <original error>``) so lineage shows which
    rows took a lower-fidelity profile; if every rung fails the normal
    fallback row is returned."""
    result, normalized = extract_turn(text, config, variant_mapper)
    if result.status != STATUS_FALLBACK:
        return result, normalized
    original_err = result.error
    for k, cfg in enumerate(ladder):
        try:
            r = extract_once(text, cfg)
        except Exception:  # noqa: BLE001 — rung failed, try the next
            continue
        r = Extraction(
            r.route, r.extracted_text, r.spans, r.status,
            f"degraded[{k}]: {original_err}",
        )
        return r, None
    return result, normalized
