"""Export sinks (S6/S7 analogs) + R3 degradation ladder."""

import pyarrow as pa
import ray.data as rd

from intelligent_ocr_ray.config import DEFAULT_CONFIG, ExtractorConfig
from intelligent_ocr_ray.functions.extract import (
    degraded_ladder,
    extract_turn,
    extract_turn_ladder,
)
from intelligent_ocr_ray.pipelines.export import conversation_text

POISON = "%LAYOUT\n10,10,50,20,0.9|hello\nTHIS LINE IS BROKEN\n10,30,50,40,0.8|world"
GOOD = "%LAYOUT\n10,10,50,20,0.9|hello\n10,30,50,40,0.8|world"


# --- degradation ladder ---------------------------------------------------


def test_poisoned_layout_falls_back_without_ladder():
    ext, _ = extract_turn(POISON, DEFAULT_CONFIG)
    assert ext.status == "fallback"
    assert ext.extracted_text == POISON  # fallback copy


def test_ladder_recovers_poisoned_layout():
    ladder = degraded_ladder(DEFAULT_CONFIG)
    ext, _ = extract_turn_ladder(POISON, DEFAULT_CONFIG, ladder)
    assert ext.status == "ok"
    assert ext.extracted_text == "hello\nworld"  # broken line dropped
    assert ext.error.startswith("degraded[0]:")


def test_ladder_no_change_for_healthy_rows():
    ladder = degraded_ladder(DEFAULT_CONFIG)
    a, _ = extract_turn(GOOD, DEFAULT_CONFIG)
    b, _ = extract_turn_ladder(GOOD, DEFAULT_CONFIG, ladder)
    assert a == b


def test_lenient_config_direct():
    cfg = ExtractorConfig(lenient_layout=True)
    ext, _ = extract_turn(POISON, cfg)
    assert ext.status == "ok"
    assert ext.extracted_text == "hello\nworld"


def test_ladder_in_pipeline_reduces_fallbacks():
    from intelligent_ocr_ray.pipelines.extract import extract_dataset

    t = pa.table(
        {
            "conv_id": pa.array(["c"] * 3, pa.string()),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "role": pa.array(["user"] * 3, pa.string()),
            "text": pa.array([POISON, GOOD, "plain words"], pa.string()),
        }
    )
    plain = extract_dataset(rd.from_arrow(t), DEFAULT_CONFIG).to_pandas()
    laddered = extract_dataset(
        rd.from_arrow(t), DEFAULT_CONFIG, use_ladder=True
    ).to_pandas()
    assert (plain.status == "fallback").sum() == 1
    assert (laddered.status == "fallback").sum() == 0
    rec = laddered[laddered.turn_idx == 0].iloc[0]
    assert rec.error.startswith("degraded[0]:")
    assert rec.extracted_text == "hello\nworld"


def test_transient_fault_retried():
    """R1: the retry loop exists for TRANSIENT faults (subclassed /
    flaky extractors); deterministic ExtractError short-circuits but a
    non-ExtractError exception gets retried and can succeed."""
    import intelligent_ocr_ray.functions.extract as fx

    calls = {"n": 0}
    real = fx.extract_once

    def flaky(text, config):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient blip")
        return real(text, config)

    orig = fx.extract_once
    fx.extract_once = flaky
    try:
        ext, _ = fx.extract_turn("plain words", DEFAULT_CONFIG)
    finally:
        fx.extract_once = orig
    assert ext.status == "ok"
    assert calls["n"] == 2  # one failure + one successful retry


def test_deterministic_error_not_retried():
    import intelligent_ocr_ray.functions.extract as fx

    calls = {"n": 0}
    real = fx.extract_once

    def counting(text, config):
        calls["n"] += 1
        return real(text, config)

    fx.extract_once = counting
    try:
        ext, _ = fx.extract_turn(POISON, DEFAULT_CONFIG)
    finally:
        fx.extract_once = real
    assert ext.status == "fallback"
    assert calls["n"] == 1  # ExtractError is deterministic → no retries


# --- export sinks ---------------------------------------------------------


def _extracted_fixture():
    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(["b", "a", "a"], pa.string()),
                "turn_idx": pa.array([0, 1, 0], pa.int32()),
                "role": pa.array(["user", "assistant", "user"], pa.string()),
                "extracted_text": pa.array(["bee", "second", "first"], pa.string()),
            }
        )
    )


def test_export_txt_view():
    out = conversation_text(_extracted_fixture(), "txt").to_pandas()
    out = out.sort_values("conv_id").reset_index(drop=True)
    assert list(out.conv_id) == ["a", "b"]
    assert list(out.n_turns) == [2, 1]
    a = out.content[0]
    # turns in stable order with separators
    assert a == "--- turn 0 ---\nfirst\n\n--- turn 1 ---\nsecond"


def test_export_md_view():
    out = conversation_text(_extracted_fixture(), "md").to_pandas()
    a = out[out.conv_id == "a"].content.iloc[0]
    assert a.startswith("## turn 0 (user)\n\nfirst")
    assert "## turn 1 (assistant)\n\nsecond" in a


def test_export_roundtrip(tmp_path):
    from intelligent_ocr_ray.pipelines.export import export_txt

    export_txt(_extracted_fixture(), str(tmp_path / "txt"))
    back = rd.read_parquet(str(tmp_path / "txt")).to_pandas()
    assert len(back) == 2
    assert set(back.columns) == {"conv_id", "n_turns", "content"}


def test_export_md_media_writes_sidecars(tmp_path):
    """S7 full analog: markdown embeds relative media links and the
    worker writes the media bytes as sidecar files."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from intelligent_ocr_ray.pipelines.export import export_md_media
    from intelligent_ocr_ray.stages.multimodal import fake_image_bytes

    rows = {
        "conv_id": pa.array(["a", "a", "b"], pa.string()),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": pa.array(["user", "assistant", "user"], pa.string()),
        "extracted_text": pa.array(["hello", "world", "solo"], pa.string()),
        "image": pa.array([fake_image_bytes(1), None, fake_image_bytes(2)], pa.binary()),
    }
    out = str(tmp_path / "md")
    conv = export_md_media(rd.from_arrow(pa.table(rows)), out).to_pandas()
    conv = conv.set_index("conv_id")
    assert conv.loc["a", "n_media"] == 1 and conv.loc["b", "n_media"] == 1
    a = conv.loc["a", "content"]
    assert "## turn 0 (user)" in a and "hello" in a
    assert "![turn 0](media/a/turn-00000.bin)" in a
    assert "![turn 1]" not in a  # null media → text-only block
    with open(os.path.join(out, "media", "a", "turn-00000.bin"), "rb") as f:
        assert f.read() == fake_image_bytes(1)
    # the parquet view is written to its own subdir (no media/*.bin in
    # the same directory a parquet reader would scan)
    import glob

    assert glob.glob(os.path.join(out, "conversations", "*.parquet"))
    assert not glob.glob(os.path.join(out, "*.parquet"))
