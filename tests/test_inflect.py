"""Czech inflection expansion — the reference's own golden tests
(/root/reference/automata/tests/test_kb2namelist.py), adapted: the
originals are unrunnable in the reference tree (merge-conflict
SyntaxError in namelist.py, stale 3-tuple/5-column call signature), so
the expected sets are ported verbatim and the call adapted to this
repo's process_name_inflections signature."""

import itertools

import pytest

from ner_spark.semantics.inflect import (expand_tagged_inflections,
                                         process_name_inflections)

DASH_VARIANTS = ["-", "–", "—", "\xad"]


def _run(expected_basename: str, column_inflection: str,
         flags: str = "P:::M"):
    line = f"{expected_basename}\tcs\t{flags}\t{column_inflection}\t"
    name, lang, fl, inflections, uri, subnames, surnames = \
        process_name_inflections(line)
    assert name == expected_basename
    return inflections, subnames, surnames


@pytest.mark.parametrize("dash", DASH_VARIANTS)
def test_name_inflections_dash_delimiter(dash):
    """test_kb2namelist.py:13-23 + 194-220 (all four dash codepoints).
    NB the reference's shipped build_name_variant would WARN-SKIP these
    (firstname ends with dash) and emit nothing — its own test expects
    the cross-product, which is what this implementation produces."""
    firstnames = ["Adamu", "Adamovi"]
    sur1 = ["Philippovi", "Philippemu"]
    junction = "de"
    sur2 = ["Custinemu", "Custinu", "Custine", "Custinovi"]

    expected = {f"{f}{dash}{s1} {junction} {s2}"
                for f in firstnames for s1 in sur1 for s2 in sur2}
    col = "/".join(f"{x}[k1gMnSc3]#jG" for x in firstnames)
    col += dash + "/".join(f"{x}[k1gMnSc3]#jS" for x in sur1)
    col += f" {junction}#jS"
    col += " " + "/".join(f"{x}[k1gMnSc3]#jS" for x in sur2)

    inflections, _, _ = _run(f"Adam{dash}Philippe de Custine", col)
    assert expected <= inflections
    # the only extras allowed are the F/M-mode shortened forms, which
    # all keep the dash structure; nothing outside the variant alphabet
    for n in inflections - expected:
        assert any(f in n for f in firstnames) or "Custin" in n


def test_name_inflections_comma_delimiter():
    """test_kb2namelist.py:25-55: trailing comma stays attached to each
    surname variant; the generation mark keeps its own part."""
    firstnames = ["Alfredu", "Alfredovi"]
    first2 = ["Pritchardu", "Pritchardovi"]
    surnames = ["Sloanu", "Sloanovi"]
    expected = {f"{a} {b} {c}, Jr."
                for a in firstnames for b in first2 for c in surnames}
    col = "/".join(f"{x}[k1gMnSc6]#jG" for x in firstnames)
    col += " " + "/".join(f"{x}[k1gMnSc6]#jG" for x in first2)
    col += " " + "/".join(f"{x}[k1gMnSc6]#jS" for x in surnames)
    col += ", Jr.#GS"

    inflections, _, _ = _run("Alfred Pritchard Sloan, Jr.", col)
    assert inflections == expected


def test_name_inflections_dotted():
    """test_kb2namelist.py:57-80: zero-width-glued dotted abbreviations
    collapse without spaces."""
    first = ["Hohenbergu", "Hohenbergerovi"]
    dotted = ["a.", "d."]
    second = ["Egeru", "Egerovi", "Egru", "Egrovi"]
    expected = {f"{f} {''.join(dotted)}{s}" for f in first for s in second}
    col = "/".join(f"{x}[k1gMnSc6]#jL" for x in first)
    col += " "
    col += "".join(f"{x}#A​" for x in dotted)
    col += "/".join(f"{x}[kg1MnSc6]#jL" for x in second)

    inflections, _, _ = _run("Hohenberg a.d.Eger", col)
    assert inflections == expected


def test_name_inflections_dotted_dashed_combination():
    """test_kb2namelist.py:82-109."""
    dotted = ["R.", "W."]
    d1 = ["Setonu", "Setonovi"]
    d2 = ["Watsonu", "Watsonovi"]
    expected = {f"{''.join(dotted)} {a}-{b}" for a in d1 for b in d2}
    col = "".join(f"{x}#I​" for x in dotted)
    col += " " + "/".join(f"{x}[k1gMnSc6]#jS" for x in d1)
    col += "-" + "/".join(f"{x}[k1gMnSc6]#js" for x in d2)

    inflections, _, _ = _run("R.W. Seton-Watson", col)
    assert expected <= inflections
    for n in inflections - expected:  # only shortened-form extras
        assert "Seton" in n or "Watson" in n


def test_name_inflections_dashed_bo_gdanovic():
    """test_kb2namelist.py:111-129: a soft hyphen INSIDE a surname token
    (before the tags) must not split the variant group."""
    first = ["Bogdanovi", "Bogdanu"]
    sur = ["Bo\xadgdanovićovi", "Bo\xadgdanovići"]
    expected = {f"{f} {s}" for f in first for s in sur}
    col = "/".join(f"{x}[k1gMnSc3]#jG" for x in first)
    col += " " + "/".join(f"{x}[k1gMnSc3]#jS" for x in sur)

    inflections, _, _ = _run("Bogdan Bo\xadgdanović", col)
    assert expected <= inflections
    for n in inflections - expected:
        assert "gdanović" in n


def test_name_inflections_hypothetic_dash_combinations():
    """test_kb2namelist.py:131-168: marked and unmarked dashes combined —
    a dash inside a variant (before its tags) is literal, a dash between
    flagged variant groups is a combinator."""
    first = ["Bogdanovi", "Bogdanu"]
    mid = ["gda", "gdá"]
    last = ["novići", "novićovi"]
    for dash1, dash2 in itertools.product(DASH_VARIANTS, DASH_VARIANTS):
        expected = {f"{f} Bo{dash1}{m}{dash2}{l}"
                    for f in first for m in mid for l in last}
        col = "/".join(f"{x}[k1gMnSc3]#jG" for x in first)
        col += " " + "/".join(f"Bo{dash1}{x}[k1gMnSc3]#jS" for x in mid)
        col += dash2 + "/".join(f"{x}[k1gMnSc3]#jS" for x in last)
        inflections, _, _ = _run(f"Bogdan Bo{dash1}gda{dash2}nović", col)
        assert expected <= inflections, (dash1, dash2)
        for n in inflections - expected:
            assert "gd" in n, (dash1, dash2, n)


def test_simple_person_shortening_and_subnames():
    """The F/M branch the reference tests leave unexercised, specified by
    _shorten_name's comment examples (KB2namelist.py:213-238):
    "Tadeáš Hájek z Hájku" gains "Tadeáš Hájek", "Tadeáš HÁJEK",
    "Tadeáš HÁJEK z Hájku", "Tadeáš HÁJEK Z HÁJKU"."""
    col = ("Tadeáši[k1gMnSc3]#jG Hájkovi[k1gMnSc3]#jS"
           " z#7 Hájku[k1gMnSc2]#jL")
    inflections, subnames, surnames = _run("Tadeáš Hájek z Hájku", col)
    assert "Tadeáši Hájkovi z Hájku" in inflections
    assert "Tadeáši Hájkovi" in inflections           # surname cut
    assert "Tadeáši HÁJKOVI" in inflections           # upper (basic form)
    assert "Tadeáši HÁJKOVI z Hájku" in inflections
    # NB the reference comment says "Z HÁJKU", but its _name_to_upper
    # (KB2namelist.py:187-210) uppercases only already-capitalized
    # tokens, so the preposition stays lowercase — code over comment
    assert "Tadeáši HÁJKOVI z HÁJKU" in inflections
    assert "Tadeáši" in subnames and "Hájkovi" in subnames
    assert "Hájkovi" in surnames


def test_no_inflections_fm_fallback_subnames():
    """KB2namelist.py:531-534: an F/M line with an empty inflection
    column still yields subnames from the base name."""
    line = "Antonín Dvořák\tcs\tP:::M\t\t"
    _, _, _, infl, _, subnames, _ = process_name_inflections(line)
    assert infl == set()
    assert {"Antonín", "Dvořák"} <= subnames


def test_expand_tagged_inflections_shape():
    lines = [
        "Antonín Dvořák\tcs\tP:::M\t"
        "Antonínu[k1gMnSc3]#jG/Antonínovi[k1gMnSc3]#jG "
        "Dvořáku[k1gMnSc3]#jS/Dvořákovi[k1gMnSc3]#jS\t",
        "",
    ]
    out = expand_tagged_inflections(lines)
    infl, subs, surnames = out["Antonín Dvořák"]
    assert {"Antonínu Dvořáku", "Antonínovi Dvořákovi",
            "Antonínu Dvořákovi", "Antonínovi Dvořáku"} <= infl
    assert {"Antonínu", "Antonínovi", "Dvořáku", "Dvořákovi"} <= subs
    # P-flagged line → surname derivatives surface (the reference's
    # surname→URI side channel, KB2namelist.py:785-792)
    assert {"Dvořáku", "Dvořákovi"} <= surnames


def test_cs_inflections_reach_automaton(spark):
    """cs-mode end-to-end: namegen tagged-inflection lines expand into
    namelist keys, so the automaton finds the INFLECTED surface form in
    Czech text and it resolves to the KB entity — the §3.3 build stage
    (create_cedar.sh:369) previously scoped out."""
    from ner_spark.kb.build import compile_kb
    from ner_spark.semantics.lang import get_lang
    from ner_spark.semantics.recognize import recognize

    rows = [
        dict(id=1, type="person", name="Antonín Dvořák", gender="M",
             description="Czech composer.", jobs="composer",
             wiki_backlinks=100, wiki_hits=100, wiki_ps=1),
    ]
    tagged = [
        "Antonín Dvořák\tcs\tP:::M\t"
        "Antonínu[k1gMnSc3]#jG/Antonínovi[k1gMnSc3]#jG "
        "Dvořáku[k1gMnSc3]#jS/Dvořákovi[k1gMnSc3]#jS\t",
    ]
    art = compile_kb(spark, rows, lang="cs", tagged_inflections=tagged,
                     add_pronouns=False, add_subname_fragments=False)
    # dative inflection, not the base NAME — only reachable via namegen
    text = "Dali jsme dárek Antonínovi Dvořákovi po koncertě ."
    out = recognize(art.bundle, art.automaton, text, lang=get_lang("cs"))
    assert [(r["text"], r["sense"]) for r in out
            if r["kind"] == "kb"] == [("Antonínovi Dvořákovi", 1)]
    # surname derivatives reach the -n name gazetteer's keyspace
    # (deaccent+lower, person lines of the base name) — the analogue of
    # the reference's surnames_with_typeflags derivatives dump
    assert art.bundle.name_dict.get("dvoraku") == frozenset({1})
    assert art.bundle.name_dict.get("dvorakovi") == frozenset({1})
    # the en build must refuse namegen input
    import pytest as _pytest
    with _pytest.raises(ValueError):
        compile_kb(spark, rows, lang="en", tagged_inflections=tagged)
