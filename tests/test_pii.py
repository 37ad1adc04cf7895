"""PII scrubbing vs an exact Python-`re` oracle (same pattern strings)."""

from __future__ import annotations

import re

from ner_spark.textops.pii import PII_PATTERNS, scrub_pii


def _oracle(text):
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[name] = len(re.findall(pat, text))
        text = re.sub(pat, repl, text)
    return text, counts


def test_scrub_pii_matches_re_oracle(spark, pages_rows):
    samples = [
        "contact me at john.doe+spam@example.co.uk or JANE@SUB.HOST.ORG now",
        "server 192.168.0.1 and 10.0.0.255, not 1234.5.6.7 exactly",
        "call +1 555 123 4567 or +420-601-234-567 today",
        "mixed: a@b.io at 8.8.8.8 ring +44 20 7946 0958 done",
        "clean text with no pii at all, just words and 42 numbers",
        "edge a@b.cd e@f.gh 0.0.0.0 +7 12 34 56",
    ] + [p["text"] for p in pages_rows[:20]]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(samples)], "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert len(got) == len(samples)
    any_pii = False
    for i, t in enumerate(samples):
        clean, counts = _oracle(t)
        r = got[i]
        assert r.clean == clean, (i, t)
        assert (r.n_email, r.n_ipv4, r.n_phone) == (
            counts["email"], counts["ipv4"], counts["phone"]), (i, t)
        assert r.has_pii == (sum(counts.values()) > 0)
        any_pii = any_pii or r.has_pii
    assert any_pii  # fixture actually exercises the masks


def test_scrub_pii_is_codegen(spark):
    """No Python in the hot path: the plan is a single codegen'd Project
    over the scan — no BatchEvalPython / MapInPandas stages."""
    df = spark.createDataFrame([(1, "a@b.io")], "doc_id long, text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
