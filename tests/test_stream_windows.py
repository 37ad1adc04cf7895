"""Streaming windowed aggregation: stream result equals the batch
computation; watermark node present in the streaming plan."""


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    from ner_spark.streaming.windows import (run_windowed_counts,
                                             windowed_event_counts)

    rows = [(i, "click" if i % 3 else "purchase",
             1_700_000_000 + i * 137.0, float(i % 7)) for i in range(200)]
    schema = "event_id long, event_type string, ts double, value double"
    inp = str(tmp_path / "in")
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.parquet(inp)

    q = run_windowed_counts(spark, inp, str(tmp_path / "ckpt"), schema,
                            query_name="wct")
    q.awaitTermination(120)

    got = {(r.win_start, r.win_end, r.key): (r.n_events, r.total_value)
           for r in spark.sql("SELECT * FROM wct").collect()}
    want = {(r.win_start, r.win_end, r.key): (r.n_events, r.total_value)
            for r in windowed_event_counts(df).collect()}
    assert got == want and len(want) > 4


def test_watermark_in_streaming_plan(spark, tmp_path):
    from ner_spark.streaming.windows import windowed_event_counts

    schema = "event_id long, event_type string, ts double, value double"
    stream = spark.readStream.schema(schema).parquet(str(tmp_path))
    agg = windowed_event_counts(stream, watermark="15 minutes")
    assert agg.isStreaming
    plan = agg._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_windowed_counts_value_col_optional(spark):
    df = spark.createDataFrame(
        [("a", 0), ("a", 30), ("b", 90)], "k string, t long")
    from ner_spark.streaming.windows import windowed_event_counts

    out = windowed_event_counts(df, ts_col="t", key_col="k",
                                window="1 minute")
    assert "total_value" not in out.columns  # no 'value' column → count only
    got = {(r.key, r.win_start.second // 60): r.n_events for r in out.collect()}
    assert sum(got.values()) == 3

    out2 = windowed_event_counts(df, ts_col="t", key_col="k",
                                 window="1 minute", value_col=None)
    assert "total_value" not in out2.columns


def test_session_windows_batch_semantics(spark):
    """Spark merges while the gap is ≤ the threshold (an event landing
    exactly on the previous window's end joins it); only gap > threshold
    starts a new session.  Window end = last event + gap."""
    from ner_spark.streaming.windows import session_window_counts

    base = 1_700_000_000
    rows = [
        (1, "u1", float(base), 1.0),
        (2, "u1", float(base + 100), 2.0),         # same session
        (3, "u1", float(base + 100 + 1800), 4.0),  # exactly gap → MERGES
        (4, "u1", float(base + 100 + 1800 + 1801), 16.0),  # > gap → new
        (5, "u2", float(base), 8.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, "
                                     "ts double, value double")
    out = {(r.key, r.win_start.timestamp(), r.win_end.timestamp()):
           (r.n_events, r.total_value)
           for r in session_window_counts(df, key_col="user_id",
                                          gap="30 minutes").collect()}
    t3 = base + 100 + 1800
    assert out == {
        ("u1", base, t3 + 1800): (3, 7.0),
        ("u1", t3 + 1801, t3 + 1801 + 1800): (1, 16.0),
        ("u2", base, base + 1800): (1, 8.0),
    }


def test_session_windows_streaming_plan(spark, tmp_path):
    from ner_spark.streaming.windows import session_window_counts

    schema = "event_id long, user_id string, ts double, value double"
    stream = spark.readStream.schema(schema).parquet(str(tmp_path))
    agg = session_window_counts(stream, key_col="user_id")
    assert agg.isStreaming
    plan = agg._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
    assert "session_window" in plan
