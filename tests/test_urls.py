"""URL canonicalization (textops/urls.py)."""

import pytest

from pyspark.sql import functions as F

from ner_spark.textops.urls import canonicalize_url, url_domain

CASES = [
    # scheme/host lowercase, default https port, tracking run, fragment
    ("HTTPS://WWW.Example.COM:443/Path/Page?utm_source=x&id=3&utm_b=2#f",
     "https://www.example.com/Path/Page?id=3", "www.example.com"),
    # default http port on bare root
    ("http://example.org:80/", "http://example.org/", "example.org"),
    # non-default port survives
    ("http://example.org:8080/a?x=1", "http://example.org:8080/a?x=1",
     "example.org"),
    # a run of ONLY tracking params loses the '?'
    ("https://a.b/p?utm_a=1&utm_b=2&utm_c=3", "https://a.b/p", "a.b"),
    ("https://a.b/p?ref=z", "https://a.b/p", "a.b"),
    # tracking param in the middle, order of the rest preserved
    ("https://a.b/p?id=1&fbclid=abc&q=2", "https://a.b/p?id=1&q=2", "a.b"),
    # PATH case is preserved; query param values too
    ("https://A.B/CaSe?Q=Vv", "https://a.b/CaSe?Q=Vv", "a.b"),
    # non-http(s) and relative refs pass through untouched
    ("mailto:someone@example.com", "mailto:someone@example.com", ""),
    ("/relative/path?utm_source=x", "/relative/path?utm_source=x", ""),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "url string")
    got = df.select(canonicalize_url("url").alias("c"),
                    url_domain("url").alias("d")).collect()
    for (raw, want_c, want_d), row in zip(CASES, got):
        assert row.c == want_c, raw
        assert row.d == want_d, raw


def test_canonicalize_idempotent_and_narrow(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "url string")
    twice = df.select(canonicalize_url("url").alias("c1")) \
              .select("c1", canonicalize_url("c1").alias("c2"))
    assert twice.filter("c1 <> c2").count() == 0
    plan = df.select(canonicalize_url("url"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("n", [0, 1, 5])
def test_tracking_runs_of_any_length(spark, n):
    params = "&".join(f"utm_p{i}={i}" for i in range(n))
    url = f"https://h.x/p?{params}&keep=1" if n else "https://h.x/p?keep=1"
    df = spark.createDataFrame([(url,)], "url string")
    assert df.select(canonicalize_url("url").alias("c")).collect()[0].c \
        == "https://h.x/p?keep=1"
