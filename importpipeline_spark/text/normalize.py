"""Unicode normalization matching the reference's analyzer chain.

- ``strip_diacritics``: NFD → drop NonSpacingMark → NFC, the semantics of
  NormalizeConverter (/root/reference/ImportPipeline/Converters/NormalizeConverter.cs:41-67)
  and of the ES ``asciifolding``-ish filter in the index template
  (/root/reference/ImportPipeline/index.config.js:66-76).
- ``fold_special_chars``: Unicode punctuation/space variants → ASCII, the
  semantics of SpecialCharsReplacer
  (/root/reference/ImportPipeline/SpecialCharsReplacer.cs:41-68).

Everything here is pandas-vectorized (used inside Arrow UDFs only).

Fast paths (r8 optimization; semantics unchanged, equality with the scalar
reference pinned in tests/test_operators.py):

- pure-ASCII strings are identities for both ops (the fold table has only
  non-ASCII keys; NFD/NFC are identities on ASCII and ASCII contains no Mn
  codepoints) — detected with the C-speed ``str.isascii()``;
- strings entirely within U+0000–U+024F (ASCII + Latin-1 Supplement + Latin
  Extended-A/B — the vast majority of web text) are stripped with a
  precomputed per-codepoint ``str.translate`` table. This is *exactly*
  equivalent to the whole-string NFD→drop-Mn→NFC there: every such codepoint
  canonically decomposes to a base starter plus Mn marks only (the combining
  blocks start at U+0300), removing ALL Mn makes canonical reordering
  irrelevant, and the remaining characters are ccc=0 starters with no
  NFC composition pairs among them (Hangul Jamo, the composing non-Mn
  case, lies far outside the range). Anything beyond the range falls back
  to the full vectorized pipeline. Measured 10× on the build's tokenize
  stage, which was ~60% of the fused kernel's Python time.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

import pandas as pd

# U+2000–U+200B spaces → ' ', NBSP → ' ', curly quotes/dashes → ASCII
_FOLD_TABLE = {c: " " for c in range(0x2000, 0x200C)}
_FOLD_TABLE.update(
    {
        0x00A0: " ",
        0x2018: "'",
        0x2019: "'",
        0x201A: "'",
        0x201C: '"',
        0x201D: '"',
        0x201E: '"',
        0x2013: "-",
        0x2014: "-",
        0x2212: "-",
    }
)

# one character class matching exactly the fold table's keys: translate()
# only runs on strings that actually contain a foldable char
_FOLD_RE = re.compile("[" + "".join(map(chr, sorted(_FOLD_TABLE))) + "]")

# any char beyond the per-codepoint-safe Latin range (see module docstring)
_BEYOND_LATIN = re.compile(r"[^\x00-ɏ]")


@lru_cache(maxsize=1)
def _mn_regex() -> re.Pattern:
    """Regex matching every NonSpacingMark codepoint (full Unicode range, so
    the vectorized path strips exactly what strip_diacritics_scalar strips —
    astral Mn marks included). Built once per process (~1s), cached — and
    only ever built when a string beyond U+024F shows up (the Latin
    translate-table fast path never needs it)."""
    chars = [
        chr(c) for c in range(0x110000) if unicodedata.category(chr(c)) == "Mn"
    ]
    return re.compile("[" + "".join(re.escape(c) for c in chars) + "]")


def _strip_slow(s: str) -> str:
    """The reference implementation: whole-string NFD → drop Mn → NFC."""
    nfd = unicodedata.normalize("NFD", s)
    out = "".join(ch for ch in nfd if unicodedata.category(ch) != "Mn")
    return unicodedata.normalize("NFC", out)


@lru_cache(maxsize=1)
def _latin_strip_table() -> dict:
    """Per-codepoint strip result for U+0080–U+024F (exact equivalence
    argument in the module docstring)."""
    return {c: _strip_slow(chr(c)) for c in range(0x80, 0x250)}


def fold_special_chars(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: x.translate(_FOLD_TABLE)
        if isinstance(x, str) and not x.isascii() and _FOLD_RE.search(x)
        else x
    )


def strip_diacritics(s: pd.Series) -> pd.Series:
    """NFD → strip Mn → NFC (vectorized, with the Latin fast path)."""
    tbl = _latin_strip_table()

    def classify(x):
        if not isinstance(x, str) or x.isascii():
            return 0
        return 2 if _BEYOND_LATIN.search(x) else 1

    cls = s.map(classify)
    latin = cls == 1
    beyond = cls == 2
    if not latin.any() and not beyond.any():
        return s
    out = s.copy()
    if latin.any():
        out[latin] = s[latin].map(lambda x: x.translate(tbl))
    if beyond.any():
        sub = s[beyond]
        nfd = sub.str.normalize("NFD")
        stripped = nfd.str.replace(_mn_regex(), "", regex=True)
        out[beyond] = stripped.str.normalize("NFC")
    return out


def strip_diacritics_scalar(s: str | None) -> str | None:
    if s is None:
        return None
    if s.isascii():
        return s
    if not _BEYOND_LATIN.search(s):
        return s.translate(_latin_strip_table())
    return _strip_slow(s)
