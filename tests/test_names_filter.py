"""Unknown-name post-filters (semantics/names_filter.py) — the
process_outputs.py intent-port (reference analyze() chain + the
shipped-disabled strict garbage suppressor)."""

from __future__ import annotations

import pytest

from ner_spark.semantics.kb import KBBundle
from ner_spark.semantics.names_filter import (
    filter_names_strict, mark_substrings, postprocess_names,
    remove_single_names, replace_parts)
from ner_spark.semantics.resolve import Mention, resolve_document


def _name(text, s, e):
    m = Mention(s, e, text[s:e], [])
    m.is_name = True
    return m


def test_replace_parts_strips_prefix_and_adjusts_span():
    text = "saw President Gorbi Halvessen today"
    n = _name(text, 4, 29)
    assert n.source == "President Gorbi Halvessen"
    replace_parts([n], text)
    assert (n.start, n.end, n.source) == (14, 29, "Gorbi Halvessen")
    assert text[n.start:n.end] == n.source  # span stays truthful


def test_replace_parts_requires_whole_words():
    # "Sir" inside "Sirhan" is a proper substring of a part → no strip
    text = "met Sirhan Bolvik here"
    n = _name(text, 4, 17)
    replace_parts([n], text, replacements=("Sir",))
    assert n.source == "Sirhan Bolvik"


def test_replace_parts_interior_match_left_alone():
    text = "met Gorbi President Halvessen here"
    n = _name(text, 4, 29)
    replace_parts([n], text, replacements=("President",))
    assert n.source == "Gorbi President Halvessen"  # offsets stay truthful


def test_mark_substrings_drops_part_subsets():
    text = "Gorbi Halvessen Jr and Gorbi Halvessen and Halvessen Gorbi"
    a = _name(text, 0, 18)    # Gorbi Halvessen Jr
    b = _name(text, 23, 38)   # Gorbi Halvessen (subset)
    c = _name(text, 43, 59)   # Halvessen Gorbi (same parts, reordered)
    kept = mark_substrings([a, b, c])
    assert kept == [a]


def test_remove_single_names():
    text = "Gorbi and Gorbi Halvessen"
    a = _name(text, 0, 5)
    b = _name(text, 10, 25)
    assert remove_single_names([a, b]) == [b]


@pytest.fixture(scope="module")
def kb():
    from ner_spark.fixtures.gen import gen_kb_rows

    return KBBundle.from_rows(gen_kb_rows())


def test_strict_filter_suppresses_garbage(kb):
    first = next(k for k in kb.name_dict)  # a known first-name key
    first_cap = first.capitalize()
    docs = {
        "On June": False,              # notfirst
        "Mellon Vattic": False,        # unknown first name
        f"{first_cap} Vattic": True,   # KB first-name evidence
        "J. K.": False,                # all initials
    }
    for value, keep in docs.items():
        n = _name(value, 0, len(value))
        out = filter_names_strict([n], kb)
        assert bool(out) == keep, value


def test_strict_filter_keeps_initial_led_names(kb):
    n = _name("J. Vattic", 0, 9)
    assert filter_names_strict([n], kb) == [n]


def test_strict_filter_drops_nationality_parts(kb):
    nat = next(iter(kb.nationality_forms))
    first = next(k for k in kb.name_dict).capitalize()
    v = f"{first} {nat}"
    n = _name(v, 0, len(v))
    assert filter_names_strict([n], kb) == []


def test_end_to_end_names_strict(kb):
    """resolve_document(find_names, names_strict) end-to-end: garbage
    suppressed, KB-first-name candidates kept."""
    first = next(k for k in kb.name_dict).capitalize()
    text = (f"It rained On June in 1990 and later Mellon Vattic sang "
            f"and then {first} Quorvik arrived.")
    loose = resolve_document(text, [], kb, find_names=True)
    strict = resolve_document(text, [], kb, find_names=True,
                              names_strict=True)
    loose_names = {r["text"] for r in loose if r["kind"] == "name"}
    strict_names = {r["text"] for r in strict if r["kind"] == "name"}
    assert "On June" in loose_names and "Mellon Vattic" in loose_names
    assert strict_names == {f"{first} Quorvik"}


def test_postprocess_chain_order(kb):
    """replace_parts runs before mark_substrings: a prefix-stripped name
    becomes a subset of a longer discovered name and is dropped."""
    text = "saw President Gorbi Halvessen and Gorbi Halvessen Jr today"
    a = _name(text, 4, 29)   # President Gorbi Halvessen
    b = _name(text, 34, 52)  # Gorbi Halvessen Jr
    out = postprocess_names([a, b], text)
    assert out == [b]
