"""Mojibake repair — UTF-8 text that was mis-decoded as cp1252/latin-1
and re-saved ("cafÃ©", "â€œ", "DvoÅ™Ã¡k"), the ftfy-style fix every
web-corpus pipeline runs before tokenization.

Deterministic subset, no external deps: a string is repaired iff

  1. it contains a mojibake marker (the UTF-8 lead bytes as cp1252
     characters: Ã Â â Å Ä …), AND
  2. the whole string round-trips ``encode('sloppy-cp1252')`` →
     ``decode('utf-8')`` strictly.

"Sloppy cp1252" maps the five code points cp1252 leaves undefined
(0x81 0x8D 0x8F 0x90 0x9D) back to their raw bytes — exactly what a
cp1252 mis-decode produces for them — with plain latin-1 as the
second candidate.  Whole-string strictness means mixed content (a
marker character in otherwise sane text, or non-Latin scripts) passes
through untouched; repair is idempotent because repaired text no
longer round-trips.  Repeated double-encoding needs repeated calls by
design (each call unwinds one layer).

Distributed form: Arrow-vectorized pandas UDF — the repair is
character-set logic no JVM expression can do; the marker prefilter
keeps the common (clean) path at one C-level regex scan per string.
"""

from __future__ import annotations

import re

# UTF-8 lead bytes 0xC2-0xF4 rendered as cp1252/latin-1 characters
# (Â Ã Ä Å … â ã ô): the visible signature of one mis-decode layer.
# Legit accented text hits this prefilter too (é is 0xE9) — harmless,
# the strict round-trip below rejects it; the filter only exists to
# keep ASCII-clean strings on the fast path — one C-level regex scan,
# not one Python substring scan per marker character.
_MARKER_RE = re.compile("[Â-ô]")
# the five cp1252 holes: a mis-decode leaves them as C1 controls
_CP1252_HOLES = {0x81: b"\x81", 0x8D: b"\x8d", 0x8F: b"\x8f",
                 0x90: b"\x90", 0x9D: b"\x9d"}


def _encode_sloppy_cp1252(s: str) -> bytes | None:
    out = bytearray()
    for ch in s:
        o = ord(ch)
        if o in _CP1252_HOLES:
            out += _CP1252_HOLES[o]
            continue
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            return None
    return bytes(out)


def fix_mojibake_str(s: str) -> str:
    """Repair one layer of cp1252/latin-1 mojibake; pass through
    anything that does not strictly round-trip."""
    if not s or _MARKER_RE.search(s) is None:
        return s
    raw = _encode_sloppy_cp1252(s)
    if raw is None:
        try:
            raw = s.encode("latin-1")
        except UnicodeEncodeError:
            return s
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return s


def fix_mojibake(col):
    """Column form: Arrow-batched pandas UDF over a string column."""
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    from pyspark.sql.functions import pandas_udf

    def fn(s: "pd.Series") -> "pd.Series":
        return s.map(lambda v: v if v is None else fix_mojibake_str(v))

    fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(fn, "string")(col)
