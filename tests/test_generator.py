"""Transcript generator determinism + fixture-class coverage."""

import pyarrow.compute as pc

from intelligent_ocr_ray.schema import TRANSCRIPT_SCHEMA
from intelligent_ocr_ray.sources.transcripts import generate_transcripts


def test_deterministic():
    a = generate_transcripts(30, seed=42)
    b = generate_transcripts(30, seed=42)
    assert a.equals(b)
    c = generate_transcripts(30, seed=43)
    assert not a.equals(c)


def test_schema():
    t = generate_transcripts(5)
    assert t.schema.equals(TRANSCRIPT_SCHEMA)


def test_mega_conversation_skew():
    t = generate_transcripts(100, seed=42, mega_every=50, mega_factor=40)
    counts = (
        t.group_by("conv_id").aggregate([("turn_idx", "count")]).to_pydict()
    )
    by_conv = dict(zip(counts["conv_id"], counts["turn_idx_count"]))
    mega = [c for c, n in by_conv.items() if n > 100]
    normal = [n for c, n in by_conv.items() if n <= 100]
    assert len(mega) == 2  # convs 49 and 99
    assert max(normal) < 20


def test_dup_turn_rows_exist():
    t = generate_transcripts(40, seed=42, dup_every=37)
    # conv 36 has a duplicated (conv_id, 0) row
    mask = pc.and_(
        pc.equal(t["conv_id"], "conv000036"), pc.equal(t["turn_idx"], 0)
    )
    assert t.filter(mask).num_rows == 2


def test_payload_class_mix():
    t = generate_transcripts(200, seed=42)
    texts = t.column("text").to_pylist()
    assert any(x.strip().startswith("%LAYOUT") for x in texts)
    assert any("<html>" in x for x in texts)
    assert any(x.strip() == "" or x in ("----", "····") for x in texts)
    assert any("蔵" in x or "経" in x or "旧" in x for x in texts)
    assert any("ＡＢＣ" in x or "Ｈｅｌｌｏ" in x or "①" in x for x in texts)
    assert any("THIS LINE HAS NO COORDINATES" in x for x in texts)
