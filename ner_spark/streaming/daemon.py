"""Streaming NER: the reference's daemon mode re-expressed.

The reference's only streaming construct is an unbounded stdin of documents
delimited by control tokens, processed one doc at a time with per-doc state
reset (ner.py:819,837-856).  The Spark equivalent: a file/table stream of
pages driven through the SAME batch ``extract_mentions`` inside
``foreachBatch`` — stateless per document, so no watermark or state store
is needed; exactly-once lands on the sink's append semantics.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ner_spark.kb.build import KBArtifacts
from ner_spark.pipeline.ner import extract_mentions

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def stream_mentions(
    spark: SparkSession,
    input_path: str,
    artifacts: KBArtifacts,
    out_path: str,
    checkpoint: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Watch ``input_path`` for page parquet files; append mention rows."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(input_path)
    )

    def handle(batch_df, epoch_id: int) -> None:
        (extract_mentions(batch_df, artifacts)
         .write.mode("append").parquet(out_path))

    writer = pages.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
