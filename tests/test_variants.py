"""Name-variant generators (X14) — golden cases mirror the reference's
comment examples (namelist.py:363-861)."""

from ner_spark.semantics.variants import (ZWSP, all_person_variants,
                                          dashed_name_variants,
                                          dotted_name_variants,
                                          geographical_variants,
                                          i_grave_variants, mc_name_variants,
                                          person_name_variants, saint_variants)


def test_two_word_person():
    v = person_name_variants("Adolf Born")
    assert "A. Born" in v
    assert "Born, Adolf" in v
    assert "Born, A." in v


def test_three_word_person():
    v = person_name_variants("Peter Paul Rubens")
    assert "P. P. Rubens" in v
    assert "Peter P. Rubens" in v
    assert "Peter Rubens" in v
    assert "Rubens, Peter Paul" in v
    assert "Rubens, P. P." in v
    assert "Paul Rubens, Peter" in v
    assert "Paul Rubens, P." in v


def test_four_word_person():
    v = person_name_variants("Johann Gottfried Bernhard Bach")
    assert "J. G. B. Bach" in v
    assert "J. G. Bernhard Bach" in v
    assert "Johann G. B. Bach" in v
    assert "Johann G. Bernhard Bach" in v
    assert "Johann Gottfried B. Bach" in v


def test_roman_numeral_blocks_reordering():
    v = person_name_variants("Karel IV.")
    assert not any("," in x for x in v)


def test_dashed_names():
    v = dashed_name_variants("Mao Ce-tung")
    assert "Mao Ce-Tung" in v
    v2 = dashed_name_variants("Mao Ce–tung")  # en-dash → also ASCII variant
    assert "Mao Ce–Tung" in v2 and "Mao Ce-Tung" in v2


def test_dotted_names():
    v = dotted_name_variants("J. M. W. Turner")
    assert f"J.{ZWSP}M.{ZWSP}W.{ZWSP}Turner" in v
    assert f"J.{ZWSP}M.{ZWSP}W. Turner" in v


def test_mc_names():
    assert mc_name_variants("Robert McCollum") == {"Robert Mc Collum"}
    assert mc_name_variants("Robert Mc Collum") == {"Robert McCollum"}


def test_i_grave():
    assert i_grave_variants("Melozzo da Forlì") == {"Melozzo da Forlí"}
    assert i_grave_variants("FORLÌ") == {"FORLÍ"}
    assert i_grave_variants("plain") == set()


def test_saint_variants_en():
    v = saint_variants("Saint Helena")
    assert "St. Helena" in v and "St.Helena" in v and "St Helena" in v
    assert "Holy Helena" in v
    v2 = saint_variants("St. Jan")
    assert "St.Jan" in v2 and "St Jan" in v2 and "Saint Jan" in v2


def test_geographical_variants():
    v = geographical_variants("Peking", "Peking is a city.", "China")
    assert v == {"Peking, China"}
    v2 = geographical_variants("Salem", "Salem is a town.", "United States")
    assert "Salem, United States" in v2 and "Salem, US" in v2
    # name not in description → no variant
    assert geographical_variants("X", "other text", "China") == set()


def test_all_person_variants_composes():
    v = all_person_variants("Adolf Born")
    assert "A. Born" in v and "Born, Adolf" in v
    assert "Adolf Born" not in v  # key itself excluded


def test_namelist_includes_variants(kb_rows):
    from ner_spark.semantics.kb import KBBundle, build_namelist

    bundle = KBBundle.from_rows(kb_rows)
    nl = build_namelist(bundle)
    pid = next(i for i in range(1, bundle.n_rows() + 1)
               if "person" in bundle.get_ent_type(i))
    name = bundle.get_data_for(pid, "NAME")
    first, last = name.split()[0], name.split()[-1]
    assert pid in nl.get(f"{first[0]}. {last}", [])
    assert pid in nl.get(f"{last}, {first}", [])


def test_stoplist_morphological_expansion(kb_rows):
    from ner_spark.semantics.kb import KBBundle, build_namelist

    bundle = KBBundle.from_rows(kb_rows)
    pid = next(i for i in range(1, bundle.n_rows() + 1)
               if "person" in bundle.get_ent_type(i))
    name = bundle.get_data_for(pid, "NAME")
    # a lowercase stop word blocks its word-wise-capitalized variant
    # (expansion runs off the as-written form, like the reference's sed \u —
    # an UPPER input cannot produce Title case)
    nl = build_namelist(bundle, stop_list={name.lower()})
    assert name not in nl or nl[name] == [0]
    # and a single-word stop form blocks the surname key (fragment stays 0)
    surname = name.split()[-1]
    nl2 = build_namelist(bundle, stop_list={surname.lower()})
    assert nl2.get(surname, [0]) == [0]
