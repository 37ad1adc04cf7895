"""Cross-document boilerplate removal (textops/boilerplate.py):
semantics on crafted corpora + the no-corpus-shuffle plan contract."""

import pytest
from pyspark.sql import functions as F

from ner_spark.textops.boilerplate import (boilerplate_segments,
                                           remove_boilerplate, segments_col)


@pytest.fixture(scope="module")
def lines_df(spark):
    footer = "(c) ACME corp all rights reserved"
    nav = "home | products | contact"
    rows = [
        (0, f"{nav}\nunique zero alpha\n{footer}"),
        (1, f"{nav}\nunique one beta\n{footer}"),
        (2, f"{nav}\nunique two gamma\n{footer}"),
        (3, f"{nav}\nunique three delta\n{footer}"),
        # doc 4: repeats a RARE line twice — both copies must survive —
        # and carries the footer in the middle, not the tail
        (4, f"rare repeated line\n{footer}\nrare repeated line"),
        (5, "totally unique document five"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lines_mode_drops_frequent_preserves_rare_duplicates(lines_df):
    # 6 docs, frac 0.5 → threshold ceil(3.0)=3: nav (4 docs) and footer
    # (5 docs) are boilerplate; 'rare repeated line' (1 doc) is not
    out = {r["doc_id"]: r for r in
           remove_boilerplate(lines_df, mode="lines",
                              min_doc_frac=0.5).collect()}
    assert out[0]["clean_text"] == "unique zero alpha"
    assert out[0]["n_seg"] == 3 and out[0]["n_removed"] == 2
    # order AND duplicates preserved for the rare line
    assert out[4]["clean_text"] == "rare repeated line\nrare repeated line"
    assert out[4]["n_removed"] == 1
    assert out[5]["clean_text"] == "totally unique document five"
    assert out[5]["n_removed"] == 0


def test_frequent_set_counts_docs_not_occurrences(lines_df):
    # 'rare repeated line' occurs twice but in ONE doc — array_distinct
    # before the explode must keep it below any doc-count threshold > 1
    segs = {r["seg"]: r["n_docs"] for r in
            boilerplate_segments(lines_df, mode="lines",
                                 min_doc_frac=1 / 6).collect()}
    assert "rare repeated line" in segs and segs["rare repeated line"] == 1
    assert segs["(c) ACME corp all rights reserved"] == 5


def test_no_boilerplate_leaves_text_unchanged(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "epsilon zeta eta theta")],
        "doc_id long, text string")
    out = remove_boilerplate(df, mode="token_chunks", n_tokens=2,
                             min_doc_frac=0.9).orderBy("doc_id").collect()
    assert out[0]["clean_text"] == "alpha beta gamma delta"
    assert [r["n_removed"] for r in out] == [0, 0]


def test_token_chunk_segments_cover_text_in_order(spark):
    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    [row] = df.select(segments_col("text", "token_chunks", 2).alias("s")) \
              .collect()
    assert row["s"] == ["a b", "c d", "e"]  # final partial chunk kept


def test_corpus_is_never_shuffled(spark, sf_dir):
    """The only hash shuffle is the segment-count agg; the document side
    reaches the output through broadcasts (no SortMergeJoin, no corpus
    Exchange between scan and project)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = remove_boilerplate(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # seg counts only
    assert "BroadcastNestedLoopJoin" in plan  # 1-row fset/total come back
