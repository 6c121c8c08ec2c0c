"""Unicode normalization matching the reference's analyzer chain.

- ``strip_diacritics``: NFD → drop NonSpacingMark → NFC, the semantics of
  NormalizeConverter (/root/reference/ImportPipeline/Converters/NormalizeConverter.cs:41-67)
  and of the ES ``asciifolding``-ish filter in the index template
  (/root/reference/ImportPipeline/index.config.js:66-76).
- ``fold_special_chars``: Unicode punctuation/space variants → ASCII, the
  semantics of SpecialCharsReplacer
  (/root/reference/ImportPipeline/SpecialCharsReplacer.cs:41-68).

Everything here is pandas-vectorized (used inside Arrow UDFs only).
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


@lru_cache(maxsize=1)
def _mn_regex() -> re.Pattern:
    """Regex matching every NonSpacingMark codepoint (full Unicode range, so
    the vectorized path strips exactly what strip_diacritics_scalar strips —
    astral Mn marks included). Built once per process (~1s), cached."""
    chars = [
        chr(c) for c in range(0x110000) if unicodedata.category(chr(c)) == "Mn"
    ]
    return re.compile("[" + "".join(re.escape(c) for c in chars) + "]")


def fold_special_chars(s: pd.Series) -> pd.Series:
    return s.map(lambda x: x.translate(_FOLD_TABLE) if isinstance(x, str) else x)


def strip_diacritics(s: pd.Series) -> pd.Series:
    """NFD → strip Mn → NFC (vectorized)."""
    nfd = s.str.normalize("NFD")
    stripped = nfd.str.replace(_mn_regex(), "", regex=True)
    return stripped.str.normalize("NFC")


def strip_diacritics_scalar(s: str | None) -> str | None:
    if s is None:
        return None
    nfd = unicodedata.normalize("NFD", s)
    out = "".join(ch for ch in nfd if unicodedata.category(ch) != "Mn")
    return unicodedata.normalize("NFC", out)
