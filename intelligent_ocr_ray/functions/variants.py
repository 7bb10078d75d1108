"""CJK variant-character normalization.

Behavioral parity with the reference's VariantMapper
(core/variants.py:1156-1284): the table is a text file with one variant
*class* per line whose FIRST character is the canonical form
(core/variants.py:1219-1232); ``normalize`` maps every character through
the table (unknown chars pass through, core/variants.py:1248);
``needs_normalization`` is True iff any char of the input is a known
non-canonical variant (core/variants.py:1265-1284). An explicit file
path beats the built-in table (core/variants.py:1168-1185).

The mapper is tiny (dict of a few hundred chars here; 10,556 in the
reference) so at scale it is built once per actor in ``__init__`` — the
canonical broadcast-small-side pattern — never shipped per batch.
"""

from __future__ import annotations

import importlib.resources
from functools import lru_cache


def parse_variants(lines) -> dict[str, str]:
    """Each non-empty line is a variant class; first char is canonical.

    Every OTHER char of the line maps to the first char. The canonical
    char itself is not in the map (it is already canonical). Later lines
    do not override earlier mappings (first-wins, deterministic).
    """
    mapping: dict[str, str] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        canonical = line[0]
        for ch in line[1:]:
            if ch not in mapping and ch != canonical:
                mapping[ch] = canonical
    return mapping


def load_variants(path: str | None = None) -> dict[str, str]:
    if path is not None:
        with open(path, encoding="utf-8") as f:
            return parse_variants(f)
    return _builtin_variants()


@lru_cache(maxsize=1)
def _builtin_variants() -> dict[str, str]:
    data = (
        importlib.resources.files("intelligent_ocr_ray")
        .joinpath("data/variants.txt")
        .read_text(encoding="utf-8")
    )
    return parse_variants(data.splitlines())


class VariantMapper:
    """Char-level lookup table with a fast translate path."""

    def __init__(self, path: str | None = None):
        self.mapping = load_variants(path)
        # str.translate with a precomputed table is the fastest pure-Python
        # path for per-char maps (SURVEY.md §2.8).
        self._table = str.maketrans(self.mapping)
        self._variant_chars = frozenset(self.mapping)

    def normalize(self, text: str) -> str:
        return text.translate(self._table)

    def needs_normalization(self, text: str) -> bool:
        return not self._variant_chars.isdisjoint(text)

    def has_variants(self, text: str) -> bool:
        return self.needs_normalization(text)
