"""Environment-drift guard: every driver-facing fixture build and kgc query
must work with Arrow conversion DISABLED.

Round-1 regression: the driver harness ran createDataFrame through the
row-at-a-time ``_createFromLocal`` fallback, where pandas nullable ``Int64``
NA degraded to float NaN and LongType rejected it — killing the four
flagship kgc queries while all local gates (Arrow on) stayed green.  The
Arrow flag is runtime-settable, so this test flips it on the shared session,
rebuilds the KB fixtures from scratch, runs the kgc queries end-to-end, and
restores the flag.
"""

from __future__ import annotations

import pytest

ARROW_KEY = "spark.sql.execution.arrow.pyspark.enabled"


@pytest.fixture()
def no_arrow(spark):
    prev = spark.conf.get(ARROW_KEY)
    spark.conf.set(ARROW_KEY, "false")
    # force a rebuild: the memoized dockb artifacts were built under Arrow
    from ner_spark.fixtures import dockb
    saved = dict(dockb._CACHE)
    dockb._CACHE.clear()
    try:
        yield spark
    finally:
        spark.conf.set(ARROW_KEY, prev)
        dockb._CACHE.clear()
        dockb._CACHE.update(saved)


def test_kb_rows_to_df_no_arrow(no_arrow):
    from ner_spark.fixtures.dockb import dockb_rows
    from ner_spark.kb.build import kb_rows_to_df

    rows = dockb_rows()
    df = kb_rows_to_df(no_arrow, rows)
    got = {r["id"]: r for r in df.collect()}
    assert len(got) == len(rows)
    # wiki stats absent from the fixture → real SQL NULLs, not NaN
    assert got[1]["wiki_backlinks"] is None


def test_kb_rows_to_df_no_arrow_with_stats(no_arrow):
    from ner_spark.kb.build import kb_rows_to_df

    rows = [dict(id=1, type="person", name="Ada", wiki_backlinks=10,
                 wiki_hits=None, wiki_ps=1),
            dict(id=2, type="person", name="Bob")]
    got = {r["id"]: r for r in kb_rows_to_df(no_arrow, rows).collect()}
    assert got[1]["wiki_backlinks"] == 10
    assert got[1]["wiki_hits"] is None
    assert got[2]["wiki_ps"] is None


def test_kgc_queries_no_arrow(no_arrow, sf_dir):
    """The four round-1 red rows, end-to-end under the non-Arrow path."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ("kgc_mention_counts", "kgc_mention_kb_join",
                 "kgc_comention_pairs", "kgc_triples"):
        df = qs[name](no_arrow, sf_dir)
        assert df.count() > 0, name


def test_compile_kb_full_fixture_no_arrow(no_arrow):
    from ner_spark.fixtures.gen import gen_kb_rows
    from ner_spark.kb.build import compile_kb

    art = compile_kb(no_arrow, gen_kb_rows())
    assert art.kb_df.count() == art.n_entities
