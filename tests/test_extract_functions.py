"""Unit tests for the pure extractor leaf functions (SURVEY.md §5:
unit tests per operator, hand-computed expectations)."""

import pytest

from intelligent_ocr_ray.config import ExtractorConfig
from intelligent_ocr_ray.functions.extract import (
    ROUTE_BLANK,
    ROUTE_HTML,
    ROUTE_PDFISH,
    ROUTE_PLAIN,
    ROUTE_PLAIN_LONG,
    ExtractError,
    extract_html,
    extract_pdfish,
    extract_turn,
    nfkc_strip,
    route_payload,
)
from intelligent_ocr_ray.functions.variants import VariantMapper

CFG = ExtractorConfig()


def test_bpe_token_count():
    import pyarrow as pa

    from intelligent_ocr_ray.stages.text_stats import bpe_token_count_batch

    t = pa.table({"text": pa.array(["Hello world, it's 2026!", "", "añ b"], pa.string())})
    out = bpe_token_count_batch(t)
    # "Hello"," world",","," it","'","s"," 2026","!" → 8 pre-tokens
    # "a","ñ"(non-ASCII run)," b" → 3 pre-tokens
    assert out.column("n_bpe_tokens").to_pylist() == [8, 0, 3]
    assert out.column("n_tokens").to_pylist() == [4, 0, 2]


def test_ngram_lang_id():
    import pyarrow as pa

    from intelligent_ocr_ray.stages.text_stats import NgramLangId

    t = pa.table(
        {
            "text": pa.array(
                [
                    "the thing and the other thing going along",
                    "la canción de la nación está de moda",
                    "der schein einer schönen Übung und die Ordnung",
                    "漢字のテキスト",
                    "zzzz qqqq",
                ],
                pa.string(),
            )
        }
    )
    out = NgramLangId()(t).column("lang_ngram").to_pylist()
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "de"
    assert out[3] == "cjk"
    assert out[4] == "other"


# --- route ---------------------------------------------------------------


@pytest.mark.parametrize(
    "payload,expected",
    [
        (None, ROUTE_BLANK),
        ("", ROUTE_BLANK),
        ("   \t\n", ROUTE_BLANK),
        ("----", ROUTE_BLANK),
        ("····", ROUTE_BLANK),
        ("• • •", ROUTE_BLANK),
        ("%LAYOUT\n1,2,3,4,0.9|hi", ROUTE_PDFISH),
        ("  %LAYOUT\n1,2,3,4,0.9|hi", ROUTE_PDFISH),
        ("<html><body><p>x</p></body></html>", ROUTE_HTML),
        ("<p>hello</p>", ROUTE_HTML),
        ("a < b and c > d", ROUTE_PLAIN),  # not html: no close tag
        ("short text", ROUTE_PLAIN),
        ("x" * 51, ROUTE_PLAIN_LONG),
        ("x" * 50, ROUTE_PLAIN),  # threshold is strict >
    ],
)
def test_route(payload, expected):
    assert route_payload(payload, CFG) == expected


# --- blank / plain -------------------------------------------------------


def test_blank_is_skipped():
    ext, norm = extract_turn("----", CFG, None)
    assert ext.status == "skipped"
    assert ext.extracted_text == ""
    assert ext.spans == []
    assert norm is None


def test_plain_nfkc():
    ext, _ = extract_turn("  ＡＢＣ　１２３  ", CFG, None)
    assert ext.status == "ok"
    assert ext.extracted_text == "ABC 123"
    assert len(ext.spans) == 1
    assert ext.spans[0].kind == ROUTE_PLAIN


def test_nfkc_strip_compat_forms():
    assert nfkc_strip(" ﬁﬂ ㎏ ") == "fifl kg"


def test_plain_long_passthrough_unchanged():
    payload = "  " + "word " * 20  # > 50 chars, leading spaces preserved
    ext, _ = extract_turn(payload, CFG, None)
    assert ext.status == "ok"
    assert ext.extracted_text == payload
    assert ext.spans[0].kind == ROUTE_PLAIN_LONG


# --- variants (dual emission) -------------------------------------------


def test_variant_dual_emission():
    vm = VariantMapper()
    ext, norm = extract_turn("大蔵経の研究", CFG, vm)
    assert ext.extracted_text == "大蔵経の研究"  # original preserved
    assert norm == "大藏經の研究"


def test_variant_none_when_canonical():
    vm = VariantMapper()
    ext, norm = extract_turn("大藏經の研究", CFG, vm)
    assert norm is None


# --- html ----------------------------------------------------------------

HTML_DOC = (
    "<html><body>"
    '<nav><ul><li><a href="/a">aaaa</a></li><li><a href="/b">bbbb</a></li>'
    '<li><a href="/c">cccc</a></li></ul></nav>'
    "<div>This is the main content block with plenty of prose text in it.</div>"
    "<p>Another real paragraph that clearly is content.</p>"
    '<footer><a href="/x">x link</a> <a href="/y">y link</a></footer>'
    "</body></html>"
)


def test_html_strips_boilerplate():
    ext = extract_html(HTML_DOC, CFG)
    assert ext.extracted_text == (
        "This is the main content block with plenty of prose text in it.\n"
        "Another real paragraph that clearly is content."
    )
    assert [s.kind for s in ext.spans] == ["html_block", "html_block"]
    assert all(s.score >= 0.5 for s in ext.spans)


def test_html_entity_unescape():
    ext = extract_html("<p>fish &amp; chips cost &lt;5 euro today okay</p>", CFG)
    assert ext.extracted_text == "fish & chips cost <5 euro today okay"


def test_html_script_style_dropped():
    doc = (
        "<p>Real content paragraph stays here today.</p>"
        "<script>var x = 'this must never ever appear';</script>"
        "<style>.a { color: red; }</style>"
    )
    ext = extract_html(doc, CFG)
    assert ext.extracted_text == "Real content paragraph stays here today."


def test_html_link_density_filter():
    # a block that is entirely links must die even if long
    doc = (
        '<div><a href="/1">one long link text here</a> '
        '<a href="/2">two long link text here</a></div>'
        "<div>surviving prose block with enough characters</div>"
    )
    ext = extract_html(doc, CFG)
    assert ext.extracted_text == "surviving prose block with enough characters"


# --- pdfish --------------------------------------------------------------


def test_pdfish_reading_order_and_vertical():
    payload = (
        "%LAYOUT\n"
        "10,40,200,52,0.95|second line\n"  # lower on the page
        "10,10,200,22,0.90|first line\n"  # upper on the page
        "400,10,420,200,0.85|縦書きの列\n"  # vertical: h=190 > 2*w=40
        "10,70,200,82,0.30|dropped by confidence\n"
    )
    ext = extract_pdfish(payload, CFG)
    assert ext.extracted_text == "first line\nsecond line\n縦書きの列"
    assert [s.vertical for s in ext.spans] == [False, False, True]
    assert [s.score for s in ext.spans] == [0.90, 0.95, 0.85]


def test_pdfish_vertical_columns_right_to_left():
    payload = (
        "%LAYOUT\n"
        "100,10,120,200,0.9|left column\n"
        "300,10,320,200,0.9|right column\n"
    )
    ext = extract_pdfish(payload, CFG)
    # right-to-left for vertical CJK column flow
    assert ext.extracted_text == "right column\nleft column"


def test_pdfish_malformed_raises():
    with pytest.raises(ExtractError):
        extract_pdfish("%LAYOUT\nNOT A LINE", CFG)


def test_poison_falls_back_to_original():
    payload = "%LAYOUT\nTHIS LINE HAS NO COORDINATES"
    ext, norm = extract_turn(payload, CFG, None)
    assert ext.status == "fallback"
    assert ext.extracted_text == payload  # fallback copy of the original
    assert ext.error is not None and "ExtractError" in ext.error
    assert norm is None


def test_poison_no_fallback_copy():
    cfg = ExtractorConfig(allow_fallback_copy=False)
    ext, _ = extract_turn("%LAYOUT\nbad", cfg, None)
    assert ext.status == "fallback"
    assert ext.extracted_text == ""


def test_low_conf_all_filtered():
    ext, _ = extract_turn(
        "%LAYOUT\n10,10,200,22,0.10|faint one\n10,40,200,52,0.20|faint two", CFG, None
    )
    assert ext.status == "ok"
    assert ext.extracted_text == ""
    assert ext.spans == []


def test_ngram_lang_id_vectorized_equals_serial():
    """Vectorized Arrow scoring ≡ the per-row Python reference (_score)
    over the mixed fixture corpus."""
    from intelligent_ocr_ray.sources.transcripts import generate_transcripts
    from intelligent_ocr_ray.stages.text_stats import NgramLangId

    t = generate_transcripts(60, seed=17)
    stage = NgramLangId()
    got = stage(t).column("lang_ngram").to_pylist()
    import pyarrow.compute as pc

    is_cjk = pc.match_substring_regex(
        t.column("text"), "[一-龥぀-ゟ゠-ヿ]"
    ).fill_null(False).to_pylist()
    want = [
        "cjk" if c else stage._score(x or "")
        for x, c in zip(t.column("text").to_pylist(), is_cjk)
    ]
    assert got == want


def test_pdfish_span_font_size_metric():
    """M12 span font metric (core/pdf_processor.py:652-659): vertical
    min(w*0.9, h/chars*0.9), horizontal min(h*0.9, w/chars*1.5),
    clamped [4, 72]; text-only routes carry 0.0 (no geometry)."""
    payload = "\n".join(
        [
            "%LAYOUT",
            "0,0,100,20,0.9|abcdefghij",       # horizontal: w=100 h=20
            "0,0,10,90,0.9|xy",                # vertical (h > 2w): w=10 h=90
            "0,0,2000,2000,0.9|ab",            # clamp high -> 72
            "0,0,3,3,0.9|toolongtextforbox",   # clamp low -> 4
        ]
    )
    from intelligent_ocr_ray.config import DEFAULT_CONFIG
    from intelligent_ocr_ray.functions.extract import extract_plain

    ext = extract_pdfish(payload, DEFAULT_CONFIG)
    by_text = {s.text: s for s in ext.spans}
    assert by_text["abcdefghij"].font_size == min(20 * 0.9, 100 / 10 * 1.5)
    assert by_text["xy"].font_size == min(10 * 0.9, 90 / 2 * 0.9)
    assert by_text["ab"].font_size == 72.0
    assert by_text["toolongtextforbox"].font_size == 4.0
    plain = extract_plain("hi", DEFAULT_CONFIG)
    assert plain.spans[0].font_size == 0.0
