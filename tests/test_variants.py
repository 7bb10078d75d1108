"""Variant-mapper semantics (reference parity: core/variants.py:1156-1284
— first-char-canonical parse, unknown passthrough, needs_normalization)."""

from intelligent_ocr_ray.functions.variants import VariantMapper, parse_variants


def test_parse_first_char_canonical():
    mapping = parse_variants(["藏蔵臧", "經経经", "國国囯"])
    assert mapping["蔵"] == "藏"
    assert mapping["臧"] == "藏"
    assert mapping["経"] == "經"
    assert mapping["国"] == "國"
    # canonical chars are not keys
    assert "藏" not in mapping
    assert "經" not in mapping


def test_parse_skips_blank_and_comment_lines():
    mapping = parse_variants(["", "# comment", "藏蔵"])
    assert mapping == {"蔵": "藏"}


def test_parse_first_wins_on_conflict():
    mapping = parse_variants(["藏蔵", "國蔵"])
    assert mapping["蔵"] == "藏"


def test_normalize_fixture_example(tmp_path):
    p = tmp_path / "variants.txt"
    p.write_text("藏蔵臧\n經経经\n國國囯\n", encoding="utf-8")
    vm = VariantMapper(str(p))
    assert vm.normalize("大蔵経") == "大藏經"
    assert vm.normalize("unknown chars pass") == "unknown chars pass"
    assert vm.needs_normalization("大蔵経")
    assert not vm.needs_normalization("大藏經")
    assert not vm.needs_normalization("")


def test_builtin_table_loads():
    vm = VariantMapper()
    assert len(vm.mapping) > 50
    assert vm.normalize("大蔵経") == "大藏經"
    # idempotent: canonical text maps to itself
    assert vm.normalize(vm.normalize("旧字体の変換")) == vm.normalize("旧字体の変換")
