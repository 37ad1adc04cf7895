"""Unknown-name post-filters — intent-port of the reference's
``name_recognizer/process_outputs.py`` Processor stages.

The reference's ``-n`` mode pipes proper-noun candidates through a
Processor whose shipped ``analyze()`` (process_outputs.py:631-654) runs:
``find_full_names`` (capitalized-run candidates — our regex+gazetteer
equivalent lives in resolve._name_candidates) → ``replace_parts`` →
``mark_substrings`` → ``remove_posessions`` (ported as F14) →
``remove_single_names``.  The garbage-name suppressor ``filter_names``
(process_outputs.py:222-283) is **commented out in the shipped flow**, and
4 of its 6 data lists are absent from the tree (names.txt, surrnames.txt,
nationalities.txt, replace.txt — only three empty list files ship); its
only in-tree consumer also crashes on Python 3 (``str.decode``,
process_outputs.py:81).  This module therefore ports the *documented
intent* (same method as SURVEY §8.4's inflections):

* the ACTIVE stages are ported faithfully where observable
  (``mark_substrings``, ``remove_single_names``) or span-adjusted where
  the reference mutates values while keeping stale offsets
  (``replace_parts`` — documented divergence below);
* ``filter_names`` is provided as the OPT-IN ``strict`` stage (mirroring
  the shipped default of disabled), with the absent lists synthesized:
  first-name evidence from the KB's own person subnames (the same
  stand-in SURVEY §8.6 item 5 used for the name gazetteer), the
  nationality list from the KB's nationality rows, and a minimal
  English ``notfirst`` table.

Documented divergences from the (unrunnable) reference code:
  * replace_parts (process_outputs.py:175-201) calls ``set_value`` with
    the replacement stripped but keeps the row's char offsets — offsets
    then point at the wrong text.  We only strip whole-word prefix /
    suffix phrase matches and adjust the span; interior matches leave
    the name unchanged.
  * filter_names' surname stage only sets a marker type consumed by the
    learned-words side file (try_to_learn) — no observable effect on
    emitted rows → not ported.
"""

from __future__ import annotations

from typing import Iterable

# Synthesized replace.txt: glue phrases that precede/follow a name but are
# not part of it (honorifics and role prefixes; the reference file is
# absent — list chosen to exercise the mechanism, extendable by callers).
DEFAULT_REPLACEMENTS = (
    "President", "Prime Minister", "Sir", "Saint", "Doctor", "Professor",
    "Senator", "General", "Captain",
)

# Synthesized notfirst.txt: words that cannot begin a person name
# (sentence-initial adverbs/prepositions the capitalized-run scan
# picks up; the reference file ships empty).
DEFAULT_NOTFIRST = frozenset({
    "On", "In", "At", "By", "The", "A", "An", "And", "But", "Or", "If",
    "On", "When", "While", "After", "Before", "During", "However",
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
    "Sunday", "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
})


def _parts(value: str) -> list[str]:
    return [p for p in value.strip().split(" ") if p]


def replace_parts(names: list, text: str,
                  replacements: Iterable[str] = DEFAULT_REPLACEMENTS) -> None:
    """process_outputs.py:175-201 intent: strip whole-word glue phrases
    from discovered names.  Mutates the name mentions in place (span and
    source adjusted together — see module docstring divergence note)."""
    for ne in names:
        val = ne.source
        np = _parts(val)
        for rp in replacements:
            if rp not in val:
                continue
            rpp = _parts(rp)
            if len(rpp) >= len(np):
                continue
            # "is_whole": every replacement part appears as a whole name
            # part, never as a proper substring of one
            if any(r in n and r != n for r in rpp for n in np):
                continue
            if val.startswith(rp + " "):
                cut = len(rp) + 1
                ne.start += cut
                ne.source = val[cut:]
            elif val.endswith(" " + rp):
                cut = len(rp) + 1
                ne.end -= cut
                ne.source = val[:-cut]
            else:
                continue  # interior match: offsets can't stay truthful
            ne.source_lower = ne.source.lower()
            val = ne.source
            np = _parts(val)


def mark_substrings(names: list) -> list:
    """process_outputs.py:203-227: drop a name whose word parts are ALL
    contained in some longer name's part list (e.g. 'John Smith' when
    'John Smith Jr' was also discovered)."""
    parts = [_parts(ne.source) for ne in names]
    dead = [False] * len(names)
    for i in range(len(names)):
        for j in range(len(names)):
            if i == j or dead[j]:
                continue
            if len(parts[i]) > len(parts[j]) and \
                    all(jp in parts[i] for jp in parts[j]):
                dead[j] = True
    return [ne for ne, dd in zip(names, dead) if not dd]


def remove_single_names(names: list) -> list:
    """process_outputs.py:589-598: names must keep >= 2 words (a
    replace_parts strip can reduce a candidate below the threshold)."""
    return [ne for ne in names if len(_parts(ne.source)) > 1]


def _is_initial(tok: str) -> bool:
    return len(tok) == 2 and tok[1] == "." and tok[0].isupper()


def filter_names_strict(names: list, kb=None,
                        notfirst: frozenset = DEFAULT_NOTFIRST) -> list:
    """The shipped-disabled garbage suppressor (process_outputs.py:222-283)
    as an opt-in stage — intent: a discovered name must look like a person
    name.  Drops a candidate when:

      * its first word is in the ``notfirst`` table (filter type 2);
      * its first word is neither a known first name (KB person-subname
        evidence standing in for the absent names.txt) nor an initial
        (type 3);
      * any part is a nationality surface (type 5);
      * every part is an initial (type 6).
    """
    name_dict = kb.name_dict if kb is not None else {}
    nat_forms = kb.nationality_forms if kb is not None else frozenset()
    out = []
    for ne in names:
        np = _parts(ne.source)
        if not np:
            continue
        first = np[0]
        if first in notfirst:
            continue
        if first.lower() not in name_dict and not _is_initial(first):
            continue
        if any(p in nat_forms for p in np):
            continue
        if all(_is_initial(p) for p in np):
            continue
        out.append(ne)
    return out


def postprocess_names(names: list, text: str, kb=None, strict: bool = False,
                      replacements: Iterable[str] = DEFAULT_REPLACEMENTS,
                      notfirst: frozenset = DEFAULT_NOTFIRST) -> list:
    """The Processor.analyze() post-filter chain over discovered name
    candidates (possessive strip F14 runs earlier, in _name_candidates —
    matching the reference's remove_posessions position is observably
    equivalent because neither stage reads the other's effect)."""
    replace_parts(names, text, replacements)
    names = mark_substrings(names)
    names = remove_single_names(names)
    if strict:
        names = filter_names_strict(names, kb, notfirst)
    return names
