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
