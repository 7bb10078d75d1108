"""config.span_text_refs: byte-thin span references (VERDICT r3 #3).

Pins (a) the default output is unchanged (text-carrying, byte-equal to
the refs form after resolve_span_text), (b) the refs form is genuinely
smaller on the wire, (c) config fingerprints differ so a resume can
never mix the two forms in one output directory.
"""

import dataclasses

import pyarrow as pa

from intelligent_ocr_ray.config import DEFAULT_CONFIG
from intelligent_ocr_ray.schema import SPAN_REF_TYPE, SPAN_TYPE, resolve_span_text
from intelligent_ocr_ray.sources.transcripts import generate_transcripts
from intelligent_ocr_ray.stages.extractor import ExtractTurns

REFS_CFG = dataclasses.replace(DEFAULT_CONFIG, span_text_refs=True)


def _batch() -> pa.Table:
    # mixed routes: blank / plain / plain_long / html / pdfish / error
    return generate_transcripts(60, seed=9)


def test_refs_resolve_to_byte_equal_default_output():
    t = _batch()
    want = ExtractTurns(DEFAULT_CONFIG)(t)
    got = ExtractTurns(REFS_CFG)(t)
    assert got.column("spans").type == pa.list_(SPAN_REF_TYPE)
    resolved = resolve_span_text(got)
    assert resolved.column("spans").type == pa.list_(SPAN_TYPE)
    assert resolved.equals(want), "refs form must resolve losslessly"
    # resolve is idempotent on already-text-carrying tables
    assert resolve_span_text(want) is want


def test_refs_form_is_smaller_on_the_wire():
    t = _batch()
    import io

    import pyarrow.parquet as pq

    def nbytes(cfg):
        buf = io.BytesIO()
        pq.write_table(ExtractTurns(cfg)(t), buf, compression="zstd")
        return buf.getbuffer().nbytes

    assert nbytes(REFS_CFG) < nbytes(DEFAULT_CONFIG)


def test_refs_fingerprint_invalidates_resume():
    assert REFS_CFG.fingerprint() != DEFAULT_CONFIG.fingerprint()


def test_refs_ladder_and_fallback_rows():
    """Fallback rows (spans=[]) and ladder-recovered pdfish rows keep
    the invariant: every span slice reproduces its text."""
    from intelligent_ocr_ray.functions.extract import degraded_ladder  # noqa: F401

    rows = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a"]),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "role": pa.array(["user"] * 3),
            "text": pa.array(
                [
                    "%LAYOUT\n1,2,3,4,0.9|hi\nBROKEN",  # strict fail
                    "%LAYOUT\n0,0,10,2,0.9|aa\n0,0,2,10,0.8|bb",  # vertical mix
                    None,
                ]
            ),
        }
    )
    out_refs = ExtractTurns(REFS_CFG, use_ladder=True)(rows)
    out_txt = ExtractTurns(DEFAULT_CONFIG, use_ladder=True)(rows)
    assert resolve_span_text(out_refs).equals(out_txt)
