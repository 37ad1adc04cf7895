"""Mojibake repair (textops/mojibake.py)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ner_spark.textops.mojibake import fix_mojibake, fix_mojibake_str

REPAIRS = [
    ("cafÃ©", "café"),
    ("naÃ¯ve rÃ©sumÃ©", "naïve résumé"),
    ("AntonÃ­n DvoÅ™Ã¡k", "Antonín Dvořák"),
    ("â€œquotedâ€\x9d wordâ€™s", "“quoted” word’s"),   # cp1252 holes (0x9D)
    ("Ð¼Ð¸Ñ€", "мир"),                                  # Cyrillic layer
    ("emâ€”dash", "em—dash"),
]
PASS_THROUGH = [
    "",
    "clean ascii",
    "café déjà vu",                 # real accents, no second layer
    "Äpfel schmecken gut",          # legit umlaut followed by ASCII
    "mixed Ã marker but 中 unfixable",
    "“already proper quotes”",
]


@pytest.mark.parametrize("raw,want", REPAIRS)
def test_repairs(raw, want):
    assert fix_mojibake_str(raw) == want


@pytest.mark.parametrize("s", PASS_THROUGH)
def test_pass_through(s):
    assert fix_mojibake_str(s) == s


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_idempotent(s):
    once = fix_mojibake_str(s)
    assert fix_mojibake_str(once) == once


@given(st.text(alphabet=st.characters(codec="utf-8"), min_size=1,
               max_size=40))
@settings(max_examples=300, deadline=None)
def test_roundtrip_of_synthetic_mojibake(s):
    """Any text broken by a cp1252 mis-decode is restored exactly —
    unless the original itself still looks like another mojibake layer
    (then one more call unwinds it; repair never mangles)."""
    try:
        broken = s.encode("utf-8").decode("cp1252")
    except UnicodeDecodeError:
        return  # bytes hit a cp1252 hole — not constructible this way
    fixed = fix_mojibake_str(broken)
    if fixed != s:
        # the only allowed deviation: s was itself repairable
        assert fix_mojibake_str(s) != s
        assert fix_mojibake_str(fixed) in (fixed, fix_mojibake_str(s))


def test_column_form(spark):
    df = spark.createDataFrame(
        [(r,) for r, _ in REPAIRS] + [(p,) for p in PASS_THROUGH],
        "text string")
    got = [r.fixed for r in
           df.select(fix_mojibake("text").alias("fixed")).collect()]
    assert got == [w for _, w in REPAIRS] + PASS_THROUGH
    plan = df.select(fix_mojibake("text"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" in plan   # vectorized, not row-at-a-time
