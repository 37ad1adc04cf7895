"""Gazetteer automaton: figa-compatible tokenization + longest-match scan
(reference semantics: /root/reference/figa/src/figa_cedar.cpp:62-81,
figa_cedar.tpp:555-616, 906-1069)."""

from ner_spark.semantics.automaton import GazetteerAutomaton, is_delimiter, tokenize


def build(*entries):
    return GazetteerAutomaton.build(entries)


def test_delimiters_ascii_only():
    assert is_delimiter(" ") and is_delimiter(",") and is_delimiter("\x01")
    assert not is_delimiter("a") and not is_delimiter("0")
    # non-ASCII is always a word char (C locale)
    assert not is_delimiter("é") and not is_delimiter("ř") and not is_delimiter("“")


def test_tokenize_offsets_and_separators():
    words = tokenize("New York, USA")
    assert [(w.text, w.start, w.end) for w in words] == [
        ("New", 0, 3), ("York", 4, 8), (",", 8, 9), ("USA", 10, 13)]
    # whitespace gap → " "; adjacent punctuation → ""
    assert words[0].sep == " "
    assert words[1].sep == ""      # York and ',' touch
    assert words[2].sep == " "
    assert words[3].sep is None    # EOF acts as strong delimiter


def test_tokenize_strong_delimiters():
    words = tokenize("Alpha\nBeta")
    assert words[0].sep is None  # newline terminates any match path


def test_tokenize_uri_rule():
    words = tokenize("see https://ex.org/a,b?c end")
    assert [w.text for w in words] == ["see", "https://ex.org/a,b?c", "end"]


def test_tokenize_collapsing_whitespace():
    words = tokenize("a   b")
    assert words[0].sep == " "
    assert [w.text for w in words] == ["a", "b"]


def test_scan_single_and_multiword():
    atm = build(("New York", (7,)), ("York", (3,)))
    ms = atm.scan("in New York today")
    assert len(ms) == 1
    m = ms[0]
    assert (m.start, m.end, m.fragment, m.ids) == (3, 11, "New York", (7,))


def test_scan_longest_match_wins_and_consumes():
    atm = build(("New York", (7,)), ("New York City", (9,)), ("City", (4,)))
    ms = atm.scan("New York City limits")
    # longest match consumed all three words → no nested/overlapping match
    assert [(m.fragment, m.ids) for m in ms] == [("New York City", (9,))]


def test_scan_backtracks_to_last_valued_node():
    atm = build(("New York", (7,)),)
    # "New York Cit" walks beyond York but must emit the York match
    ms = atm.scan("New York Cit")
    assert [(m.start, m.end) for m in ms] == [(0, 8)]


def test_scan_stops_at_newline():
    atm = build(("New York", (7,)),)
    assert atm.scan("New\nYork") == []
    assert len(atm.scan("New York")) == 1


def test_scan_match_must_start_and_end_at_words():
    atm = build(("York", (3,)),)
    ms = atm.scan("NewYork")  # no word boundary before York
    assert ms == []


def test_scan_multiple_ids_order_kept():
    atm = build(("Washington", (5, 2, 0)),)
    ms = atm.scan("Washington spoke")
    assert ms[0].ids == (5, 2, 0)  # namelist order preserved (SURVEY §1.4.4)


def test_scan_punctuation_adjacent():
    atm = build(("U.S.", (11,)),)
    ms = atm.scan("the U.S. army")
    assert [(m.start, m.end, m.fragment) for m in ms] == [(4, 8, "U.S.")]


def test_scan_unicode_offsets_in_chars():
    atm = build(("Dvořák", (1,)),)
    ms = atm.scan("Antonín Dvořák composed")
    assert [(m.start, m.end) for m in ms] == [(8, 14)]  # chars, not bytes


def test_reflexive_roundtrip(artifacts):
    """Every namelist key fed back through the automaton must yield exactly
    one match spanning the whole key with exactly its links — the same
    contract as the reference's self-test (figa/test_figa.py:85-98)."""
    atm = artifacts.automaton
    n = 0
    for key, ids in atm.iter_keys():
        ms = atm.scan(key)
        assert len(ms) == 1, key
        assert (ms[0].start, ms[0].end) == (0, len(key)), key
        assert ms[0].ids == ids, key
        n += 1
    assert n == atm.n_keys and n > 100


def test_irregular_whitespace_key_is_unmatchable():
    """Byte-faithful key storage: a hand-fed key with a double space (or
    tab) can never match — scan only builds canonical ""/" " separators —
    mirroring the reference byte-trie, which stores key bytes verbatim.
    The pipeline never produces such keys (build_namelist collapses
    whitespace), so the canonical variant of the same surface matches."""
    atm = build(("New  York", (1,)), ("Old\tTown", (2,)), ("New Deal", (3,)))
    # neither canonical nor raw text forms can reach the irregular keys
    for text in ("New York", "New  York", "Old Town", "Old\tTown",
                 "visit New   York now"):
        assert [m for m in atm.scan(text) if 1 in m.ids or 2 in m.ids] == []
    # a canonical key still matches text with ANY whitespace run (the
    # scan side collapses delimiter runs, figa_cedar.tpp:986-1003)
    assert [(m.start, m.end) for m in atm.scan("a New  Deal b")] == [(2, 11)]
    assert atm.scan("New Deal")[0].ids == (3,)


def test_byte_offset_matches_multibyte():
    """figa -b semantics: offsets into the UTF-8 byte stream (multi-byte
    chars shift everything after them; fragments unchanged)."""
    from ner_spark.semantics.automaton import (GazetteerAutomaton,
                                               byte_offset_matches)

    atm = GazetteerAutomaton.build([("Žofín", (7,)), ("New York", (1,))])
    text = "Žofín and New York à Žofín"
    ms = atm.scan(text)
    bs = byte_offset_matches(text, ms)
    assert [(m.start, m.end) for m in ms] == [(0, 5), (10, 18), (21, 26)]
    # Ž=2B í=2B → "Žofín"=7B; à=2B
    assert [(m.start, m.end) for m in bs] == [(0, 7), (12, 20), (24, 31)]
    assert [m.fragment for m in bs] == [m.fragment for m in ms]
    assert [m.ids for m in bs] == [m.ids for m in ms]


def test_newline_strong_only_as_first_delimiter_char():
    """Strong-delimiter scope (soak-found divergence, fixed r5): figa
    classifies only the delimiter char consumed immediately after a word
    (figa_cedar.tpp:985-1012) — a '\\n' that is the FIRST gap char breaks
    the match chain, but a '\\n' preceded by other whitespace loads as an
    empty word and is invisible, so the chain continues."""
    from ner_spark.semantics.automaton import GazetteerAutomaton, tokenize

    atm = GazetteerAutomaton.build(
        [("New York", (1,)), ("New", (2,))])
    # newline directly after the word: strong → shorter key wins
    assert [(m.ids, m.fragment) for m in atm.scan("New\nYork")] == \
        [((2,), "New")]
    assert [(m.ids, m.fragment) for m in atm.scan("New \n York")] == \
        [((1,), "New \n York")]
    assert [(m.ids, m.fragment) for m in atm.scan("New\t\nYork")] == \
        [((1,), "New\t\nYork")]
    assert [(m.ids, m.fragment) for m in atm.scan("New \r\n York")] == \
        [((1,), "New \r\n York")]
    # tokenize exposes the same rule through Word.sep
    seps = [w.sep for w in tokenize("a \n b\nc")]
    assert seps == [" ", None, None]
