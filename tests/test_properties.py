"""Property-based tests (hypothesis): structural invariants of the
tokenizer, automaton and resolve pipeline that must hold for ANY input."""

from hypothesis import given, settings, strategies as st

from ner_spark.semantics.automaton import (GazetteerAutomaton, is_delimiter,
                                           tokenize)
from ner_spark.semantics.textnorm import sanitize

TEXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    max_size=200)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_tokenize_offsets_partition_words(text):
    words = tokenize(text)
    last_end = 0
    for w in words:
        assert 0 <= w.start < w.end <= len(text)
        assert w.start >= last_end
        assert text[w.start:w.end] == w.text
        assert w.text != ""
        last_end = w.end
    # every non-delimiter char is covered by some word
    covered = set()
    for w in words:
        covered.update(range(w.start, w.end))
    for i, c in enumerate(text):
        if not is_delimiter(c):
            assert i in covered, (i, c)


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_scan_matches_never_overlap_and_slice_correctly(text):
    atm = GazetteerAutomaton.build([
        ("ab", (1,)), ("ab cd", (2,)), ("x", (3,)), ("Dvořák", (4,)),
    ])
    prev_end = -1
    for m in atm.scan(text):
        assert 0 <= m.start < m.end <= len(text)
        assert m.start >= prev_end  # consumed words → no overlap
        assert text[m.start:m.end] == m.fragment
        prev_end = m.end


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcXY ", min_size=1, max_size=12),
                min_size=1, max_size=20))
def test_reflexive_roundtrip_on_random_keys(keys):
    """The reflexive contract holds for CANONICAL keys — the only kind the
    pipeline produces (build_namelist collapses \\s+ and strips).  Raw keys
    with irregular gaps are byte-faithfully stored and must match nothing
    (the reference byte-trie's behaviour) — asserted in the else branch."""
    import re

    namelist = {}
    irregular = []
    for i, k in enumerate(keys):
        canon = re.sub(r"\s+", " ", k).strip()
        if not tokenize(canon):
            continue
        if canon == k:
            namelist.setdefault(k, i + 1)
        elif re.sub(r"\s+", " ", k.strip()) != k.strip():
            # irregular INTERNAL gap → unmatchable; keys differing only in
            # leading/trailing whitespace stay matchable (documented
            # divergence: tokenization drops the outer whitespace)
            irregular.append(k)
    atm = GazetteerAutomaton.build(
        (k, (v,)) for k, v in namelist.items())
    for key, ids in atm.iter_keys():
        ms = atm.scan(key)
        assert len(ms) == 1
        assert (ms[0].start, ms[0].end) == (0, len(key))
        assert ms[0].ids == ids
    for k in irregular:
        solo = GazetteerAutomaton.build([(k, (99,))])
        assert [m for m in solo.scan(k) if 99 in m.ids] == []


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_sanitize_idempotent_and_length_preserving(text):
    s = sanitize(text)
    assert len(s) == len(text)
    assert sanitize(s) == s
    assert ";" not in s


def _scan_via_tokenize(atm, text):
    """Straightforward walk over tokenize() output — the pre-optimization
    algorithm, kept as the semantic spec for the lazy-separator scan."""
    from ner_spark.semantics.automaton import Match, tokenize

    words = tokenize(text)
    out = []
    keys, prefixes, first = atm.keys, atm.prefixes, atm.first
    nw = len(words)
    i = 0
    while i < nw:
        w = words[i]
        if w.text not in first:
            i += 1
            continue
        path = w.text
        j = i
        best_j, best_ids = -1, None
        while True:
            ids = keys.get(path)
            if ids is not None:
                best_j, best_ids = j, ids
            if path not in prefixes:
                break
            sep = words[j].sep
            if sep is None or j + 1 >= nw:
                break
            j += 1
            path = path + sep + words[j].text
        if best_ids is not None:
            s, e = w.start, words[best_j].end
            out.append(Match(best_ids, s, e, text[s:e]))
            i = best_j + 1
        else:
            i += 1
    return out


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=200))
def test_optimized_scan_equals_tokenize_walk(text):
    atm = GazetteerAutomaton.build([
        ("ab", (1,)), ("ab cd", (2,)), ("cd", (3,)), ("x-y", (4,)),
        ("http://a.b/c", (5,)), ("-", (6,)), ("a b c d", (7,)),
    ])
    assert atm.scan(text) == _scan_via_tokenize(atm, text)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="ab -\n.x", min_size=1, max_size=12),
                min_size=1, max_size=8),
       st.text(alphabet="ab -\n.x", max_size=120))
def test_optimized_scan_equals_walk_random_keys(keys, text):
    atm = GazetteerAutomaton.build([(k, (i + 1,)) for i, k in enumerate(keys)])
    assert atm.scan(text) == _scan_via_tokenize(atm, text)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=400))
def test_resolve_document_never_raises_on_junk(text):
    """100-TB web text contains every imaginable byte salad; the per-doc
    kernel must process it without exceptions in every mode."""
    from ner_spark.fixtures.dockb import dockb_rows
    from ner_spark.semantics.kb import KBBundle, build_namelist
    from ner_spark.semantics.recognize import (recognize,
                                               render_reference_lines)

    global _FUZZ_STATE
    try:
        bundle, atm = _FUZZ_STATE
    except NameError:
        rows = dockb_rows() + [
            dict(id=9, type="person", name="Ada Lovelace", gender="F"),
            dict(id=10, type="geographical", name="Prague", country="CZ"),
        ]
        bundle = KBBundle.from_rows(rows)
        namelist = build_namelist(bundle)
        atm = GazetteerAutomaton.build(namelist.items())
        _FUZZ_STATE = (bundle, atm)

    for mode in ("default", "all", "score"):
        rows_out = recognize(bundle, atm, text, mode=mode)
        render_reference_lines(rows_out)
    recognize(bundle, atm, text, find_names=True)
