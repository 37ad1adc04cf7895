"""Name-variant generators (SURVEY X14) — the EN subset of the reference's
``Namelist`` variant fan-out (/root/reference/automata/src/namelist.py):

  * untagged person variants (namelist.py:761-861): initials forms for 2/3/4
    word names, middle-name drop, and "Surname, First" reorderings (the
    latter gated off for regnal names containing roman numerals);
  * dashed-name capitalization (namelist.py:445-466): parts after any dash
    capitalized, plus an ASCII-dash variant for unicode dashes;
  * dotted-name compaction (namelist.py:467-508): "J. M. W. Turner" →
    ZWSP-joined initials, then the space restored before the surname;
  * Mc-name split/join (namelist.py:510-523);
  * i-with-grave conversion ì→í (namelist.py:419-434);
  * saint abbreviation (namelist.py:371-408; EN variants Saint/Holy ↔ "St."
    per lang_modules/en/namelist.py:16-25);
  * geographical "<city>, <country>" variant with the US abbreviation
    (namelist.py:363-369 — only when the name appears in DESCRIPTION).

Pure functions over strings; ``build_namelist`` fans them out per KB entity.
The reference uses the ``regex`` module's \\p{Lu}; this module approximates
with the ASCII+Latin-1 uppercase class the rest of the repo already uses
(same trade-off as _SURNAME_RE in semantics/kb.py).
"""

from __future__ import annotations

import re

_U = "A-ZÀ-Þ"       # upper (ASCII + Latin-1, as in kb._SURNAME_RE)
_L = r"[^\W\d_]"    # any letter
ZWSP = "​"
DASHES = "-‐‑‒–—―⁃"

_RE_2 = re.compile(rf"^([{_U}]){_L}+ ([{_U}]{_L}+)$")
_RE_2_FULL = re.compile(rf"^([{_U}]{_L}+) ([{_U}]{_L}+)$")
_RE_3_ABBR_ALL = re.compile(rf"^([{_U}]){_L}+ ([{_U}]){_L}+ ([{_U}]{_L}+)$")
_RE_3_ABBR_MID = re.compile(rf"^([{_U}]{_L}+) ([{_U}]){_L}+ ([{_U}]{_L}+)$")
_RE_4_ABBR_ALL = re.compile(
    rf"^([{_U}]){_L}+ ([{_U}]){_L}+ ([{_U}]){_L}+ ([{_U}]{_L}+)$")
_RE_4_A = re.compile(rf"^([{_U}]){_L}+ ([{_U}]){_L}+ ([{_U}]{_L}+) ([{_U}]{_L}+)$")
_RE_4_B = re.compile(rf"^([{_U}]{_L}+) ([{_U}]){_L}+ ([{_U}]){_L}+ ([{_U}]{_L}+)$")
_RE_4_C = re.compile(rf"^([{_U}]{_L}+) ([{_U}]){_L}+ ([{_U}]{_L}+) ([{_U}]{_L}+)$")
_RE_4_D = re.compile(rf"^([{_U}]{_L}+) ([{_U}]{_L}+) ([{_U}]){_L}+ ([{_U}]{_L}+)$")
_RE_3_FULL = re.compile(rf"^([{_U}]{_L}+) ([{_U}]{_L}+) ([{_U}]{_L}+)$")
_RE_3_INIT_FIRST = re.compile(rf"^([{_U}]){_L}+ ([{_U}]{_L}+) ([{_U}]{_L}+)$")
_RE_ROMAN = re.compile(r"[IVX]\.")
_RE_DOT_JOIN = re.compile(rf"([{_U}]\.) (?=[{_U}])")
_RE_DOT_SPACE = re.compile(rf"(?<!,)(?<!, )([{_U}]\.){ZWSP}(?=[{_U}]{_L}+)")
_RE_MC_SPLIT = re.compile(rf"Mc([{_U}])")
_RE_MC_JOIN = re.compile(rf"Mc ([{_U}])")

SAINT_VARIANTS = ["Saint", "Holy"]  # lang_modules/en/namelist.py:16-25
SAINT_ABB = "St"
_RE_SAINT = re.compile(rf"(?:{'|'.join(SAINT_VARIANTS)}) (?=[{_U}])")
_RE_SAINT_ABB = re.compile(rf"(?<![{_U}])St[.]? (?=[{_U}])")


def _sub_if_match(rx: re.Pattern, repl: str, key: str, out: set) -> None:
    v = rx.sub(repl, key)
    if v != key:
        out.add(v)


def person_name_variants(key: str) -> set[str]:
    """Untagged person variants (namelist.py:761-861), without the key."""
    out: set[str] = set()
    _sub_if_match(_RE_2, r"\g<1>. \g<2>", key, out)               # A. Born
    _sub_if_match(_RE_3_ABBR_ALL, r"\g<1>. \g<2>. \g<3>", key, out)
    _sub_if_match(_RE_3_ABBR_MID, r"\g<1> \g<2>. \g<3>", key, out)
    _sub_if_match(_RE_3_ABBR_MID, r"\g<1> \g<3>", key, out)       # drop middle
    _sub_if_match(_RE_4_ABBR_ALL, r"\g<1>. \g<2>. \g<3>. \g<4>", key, out)
    _sub_if_match(_RE_4_A, r"\g<1>. \g<2>. \g<3> \g<4>", key, out)
    _sub_if_match(_RE_4_B, r"\g<1> \g<2>. \g<3>. \g<4>", key, out)
    _sub_if_match(_RE_4_C, r"\g<1> \g<2>. \g<3> \g<4>", key, out)
    _sub_if_match(_RE_4_D, r"\g<1> \g<2> \g<3>. \g<4>", key, out)
    if not _RE_ROMAN.search(key):  # no "Karel IV." reorderings
        _sub_if_match(_RE_2_FULL, r"\g<2>, \g<1>", key, out)      # Born, Adolf
        _sub_if_match(_RE_2, r"\g<2>, \g<1>.", key, out)          # Born, A.
        _sub_if_match(_RE_3_FULL, r"\g<3>, \g<1> \g<2>", key, out)
        _sub_if_match(_RE_3_ABBR_ALL, r"\g<3>, \g<1>. \g<2>.", key, out)
        _sub_if_match(_RE_3_FULL, r"\g<2> \g<3>, \g<1>", key, out)
        _sub_if_match(_RE_3_INIT_FIRST, r"\g<2> \g<3>, \g<1>.", key, out)
    return out


def dashed_name_variants(key: str) -> set[str]:
    """namelist.py:445-466: capitalize every dashed part; non-ASCII dashes
    also yield an ASCII-dash variant."""
    out: set[str] = set()
    for dash in DASHES:
        if dash in key:
            parts = [p[0].upper() + p[1:] if len(p) >= 2 else p
                     for p in key.split(dash)]
            out.add(dash.join(parts))
            if dash != "-":
                out.add("-".join(parts))
    out.discard(key)
    return out


def dotted_name_variants(key: str) -> set[str]:
    """namelist.py:467-508: 'J. M. W. Turner' → ZWSP-compacted initials,
    then the pre-surname space restored."""
    out: set[str] = set()
    if "." not in key:
        return out
    compact = _RE_DOT_JOIN.sub(r"\g<1>" + ZWSP, key)
    if compact != key:
        out.add(compact)
        restored = _RE_DOT_SPACE.sub(r"\g<1> ", compact)
        if restored != compact:
            out.add(restored)
    return out


def mc_name_variants(key: str) -> set[str]:
    """namelist.py:510-523: McCollum ↔ Mc Collum."""
    out: set[str] = set()
    if "Mc" in key:
        _sub_if_match(_RE_MC_SPLIT, r"Mc \g<1>", key, out)
        _sub_if_match(_RE_MC_JOIN, r"Mc\g<1>", key, out)
    return out


def i_grave_variants(key: str) -> set[str]:
    """namelist.py:419-434: ì→í / Ì→Í (Melozzo da Forlì → ... Forlí)."""
    if "ì" in key or "Ì" in key:
        return {key.replace("ì", "í").replace("Ì", "Í")}
    return set()


def saint_variants(key: str) -> set[str]:
    """namelist.py:371-408 with the EN saint list: Saint/Holy/St./St →
    'St. X', 'St.X', 'St X', and the full-word variants."""
    out: set[str] = set()
    if not (_RE_SAINT.search(key) or _RE_SAINT_ABB.search(key)):
        return out
    base = _RE_SAINT.sub(f"{SAINT_ABB}. ", key)
    base = _RE_SAINT_ABB.sub(f"{SAINT_ABB}. ", base)
    out.add(base)                                     # St. Jan
    out.add(base.replace(f"{SAINT_ABB}. ", f"{SAINT_ABB}.", 1))   # St.Jan
    out.add(base.replace(f"{SAINT_ABB}. ", f"{SAINT_ABB} ", 1))   # St Jan
    for sv in SAINT_VARIANTS:                         # Saint Jan / Holy Jan
        out.add(base.replace(f"{SAINT_ABB}. ", f"{sv} ", 1))
    out.discard(key)
    return out


def all_person_variants(key: str) -> set[str]:
    """Fan-out used by the namelist build: person reorderings + conversions
    applied over the accumulated set (the reference applies conversions to
    the whole variant set, namelist.py:436-443)."""
    variants = {key} | person_name_variants(key) | saint_variants(key)
    for v in list(variants):
        variants |= dashed_name_variants(v)
        variants |= dotted_name_variants(v)
        variants |= mc_name_variants(v)
        variants |= i_grave_variants(v)
    variants.discard(key)
    return variants


def geographical_variants(key: str, description: str, country: str) -> set[str]:
    """namelist.py:363-369: '<city>, <country>' (+US abbreviation) when the
    name occurs in the entity description and the country isn't in the name."""
    out: set[str] = set()
    if key and key in (description or "") and country and country not in key:
        out.add(f"{key}, {country}")
        us = re.sub("United States", "US", f"{key}, {country}")
        out.add(us)
    out.discard(key)
    return out
