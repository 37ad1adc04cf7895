"""Structural guards on the driver contract (__spark_entry__).

Two consecutive rounds were lost to drift between the local replica and the
driver's correctness harness:

  * round 1: Arrow-enabled toPandas masked an Int64-NA difference;
  * round 2: DuckDB types a bare ``sum(integer)`` as HUGEINT, which the
    driver's pandas fetch renders as float64 against Spark's int64 —
    hash mismatch with rows and schema matching.

These tests make the round-2 class structurally impossible: every oracle is
``DESCRIBE``d (planned, not executed) and no projected column may be
HUGEINT/UHUGEINT/DECIMAL — those types change representation under a
pandas/Arrow fetch.  A second test pins that queries() keeps all
oracle-backed entries inside the driver's 50-entry window.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def test_no_oracle_projects_hugeint_or_decimal(con):
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        hits = [(col, typ) for col, typ, *_ in desc
                if any(b in typ.upper() for b in BANNED_TYPES)]
        if hits:
            bad[name] = hits
    assert not bad, (
        f"oracles projecting pandas-unstable types (wrap in CAST(... AS "
        f"BIGINT/DOUBLE)): {bad}")


# Oracle-backed queries allowed OUTSIDE the driver's 50-entry window
# (round-4 rotation — see the queries() docstring for the policy):
#  * embed_*_full: oracle SQL byte-identical to embed_knn's (degenerate
#    configs — one bucket / full probe ≡ brute force), so the driver
#    already validates that SQL; the degenerate-equality is pytest-pinned.
#  * salted_count / customers_with_orders / tpch_q5_like / revenue_rollup:
#    parked since r2, driver-green r1+r2 (devices in-window via
#    salted_join / customers_without_orders / tpch_q10_like /
#    revenue_cube).
#  * the nine r4-parked rows: driver-green in ALL THREE prior rounds
#    (CORRECTNESS_r01/r02/r03), rotated out to make room for the rotated-
#    in r2-parked set and the three upgraded graph oracles.
_SAME_AS_KNN = {"embed_lsh_full", "embed_ivf_full"}
_REDUNDANT_ORACLE_OK = _SAME_AS_KNN | {
    # thrice-green, parked r4:
    "tpch_q3_like", "top_order_per_customer", "text_fingerprint",
    "text_langid", "text_quality", "text_token_bpe", "word_frequency",
    "dedup_exact", "kgc_connected_components",
    # parked late-r4 for dedup_simhash's / dedup_minhash's new exact
    # oracles: the 30-min-gap sessionization device stays in-window via
    # event_sessions; the shingle-explode device via dedup_jaccard's
    # candidate stage and decontaminate's shingle semi-join
    "session_windows", "dedup_ngram_jaccard",
    # parked late-r4 for url_canonical / dedup_substring (new, never
    # driver-checked): quality-gate family in-window via gopher_quality
    # + text_repetition; extraction+count via kgc_entity_degree /
    # kgc_comention_pairs / kgc_triples
    "quality_filter", "kgc_mention_counts",
    # parked r5 (each driver-green in ≥2 rounds incl. r4; devices still
    # in-window — see the queries() docstring's round-5 rotation note):
    "revenue_cube",
    "tpch_q10_like", "revenue_by_nation", "windowed_event_counts",
    "distinct_users_exact", "click_only_users", "text_token_stats",
    "event_props_json"}


def test_every_oracle_has_a_query_and_matching_order():
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    # every oracle key must be a real query
    assert set(oracles) <= set(qs)
    # the driver checks only the first 50 queries() entries: every DISTINCT
    # oracle-backed query must sit inside that window
    outside = [n for n in qs[50:]
               if n in oracles and n not in _REDUNDANT_ORACLE_OK]
    assert not outside, f"oracle-backed queries past entry 50: {outside}"
    # the parked embed queries must really be redundant: same SQL as
    # embed_knn
    for n in _SAME_AS_KNN & set(qs[50:]):
        assert oracles[n] == oracles["embed_knn"], n
    # and the first 50 entries must all be oracle-backed (no rows-only
    # query may displace one)
    assert all(n in oracles for n in qs[:min(50, len(oracles))]), (
        "rows-only queries interleaved before oracle-backed ones")


def test_oracle_matches_spark_columns(con, spark, sf_dir):
    """Column-name parity without executing Spark jobs: the driver sorts
    columns by name before hashing, so a rename on one side is a guaranteed
    hash mismatch.  DESCRIBE gives DuckDB's names; Spark's come from the
    (lazy) DataFrame schema."""
    qs = entrymod.queries()
    mismatches = {}
    for name, sql in entrymod.oracle_sql().items():
        ocols = sorted(r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall())
        scols = sorted(qs[name](spark, sf_dir).columns)
        if ocols != scols:
            mismatches[name] = (scols, ocols)
    assert not mismatches, f"spark/oracle column drift: {mismatches}"
