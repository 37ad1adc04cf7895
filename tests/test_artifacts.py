"""KB compile artifacts: namelist TSV round-trip, automaton file artifact
with version handshake, typeflag codec."""

import io

import pytest

from ner_spark.kb.artifacts import (automaton_path, load_automaton,
                                    read_namelist_tsv, save_automaton,
                                    typeflags, write_namelist_tsv)
from ner_spark.semantics.automaton import GazetteerAutomaton
from ner_spark.semantics.kb import KBBundle, build_namelist


def test_namelist_tsv_roundtrip(kb_rows):
    bundle = KBBundle.from_rows(kb_rows)
    nl = build_namelist(bundle)
    buf = io.StringIO()
    write_namelist_tsv(nl, buf)
    buf.seek(0)
    got = read_namelist_tsv(buf)
    assert got == nl
    # fragment marker rendered as 'N'
    buf.seek(0)
    lines = {l.split("\t")[0]: l.split("\t")[1] for l in
             buf.read().splitlines()}
    assert lines["he"] == "N"


def test_automaton_artifact_roundtrip(tmp_path, kb_rows):
    bundle = KBBundle.from_rows(kb_rows)
    atm = GazetteerAutomaton.build(build_namelist(bundle).items())
    p = automaton_path(str(tmp_path), "en")
    assert p.endswith("automata-en.atm")
    save_automaton(atm, p, kb_version="KB-42")
    got = load_automaton(p, kb_version="KB-42")
    assert dict(got.iter_keys()) == dict(atm.iter_keys())
    # scan behaviour identical after reload
    text = "George Washington was here ."
    assert got.scan(text) == atm.scan(text)


def test_automaton_version_handshake(tmp_path):
    atm = GazetteerAutomaton.build([("x y", (1,))])
    p = str(tmp_path / "a.atm")
    save_automaton(atm, p, kb_version="v1")
    load_automaton(p)          # no expectation → ok
    load_automaton(p, "v1")    # matching → ok
    with pytest.raises(ValueError, match="version"):
        load_automaton(p, "v2")
    with open(p, "wb") as fh:
        fh.write(b"garbage")
    with pytest.raises(ValueError, match="not an automaton"):
        load_automaton(p)


def test_typeflags_codec():
    rows = [
        dict(id=1, type="person", name="A B", gender="M", fictional="0"),
        dict(id=2, type="person:fictional", name="C D", gender="F",
             fictional="1"),
        dict(id=3, type="person:group", name="E F", gender=""),
        dict(id=4, type="geographical", name="G"),
        dict(id=5, type="organization", name="H"),
    ]
    kb = KBBundle.from_rows(rows)
    assert typeflags(kb, 1) == "P:::M"
    assert typeflags(kb, 1, ntype="nick") == "P::N:M"
    assert typeflags(kb, 2) == "P:F::F"
    assert typeflags(kb, 3) == "P:G::"
    assert typeflags(kb, 4) == "L"
    assert typeflags(kb, 5) == ""
    assert typeflags(kb, 1, ntype="pseudo") == "P::P:M"
