"""Structured Streaming operators (SURVEY.md §2.G — extension scope; the
reference is strictly request/response batch).

Two streaming plans over the file-backed `events`/`documents` fixtures:

* ``stream_window_agg`` — watermarked tumbling-window counts/sums per
  event type. Complete-mode memory sink for the finite-source test path;
  on a real unbounded source switch to append mode + a durable sink and
  the plan is unchanged.
* ``stream_embed`` — embed-on-arrival: the same hash-embed expression the
  batch ingest uses, applied incrementally (`readStream -> withColumn ->
  writeStream`) — the streaming version of ingest_hotels.py.

State scale: the window agg keys by (window, event_type); watermarking
bounds state to (max event lag / window size) windows per key, so state
size is independent of total stream length.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_COUNTER = itertools.count()

EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # file-stream sources require a directory; select the one table file
    # via pathGlobFilter
    raw = (spark.readStream.format("parquet").schema(EVENTS_RAW_SCHEMA)
           .option("pathGlobFilter", "events.parquet").load(sf_dir))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_event_agg(events: DataFrame, window: str = "1 hour",
                       watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + exact DECIMAL value sums per event type."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(20,4)")), 2)
                  .cast("double").alias("sum_value"))
            .select(F.date_format("window.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def run_stream_to_table(spark: SparkSession, stream_df: DataFrame,
                        mode: str = "complete") -> DataFrame:
    """Drive a finite file-backed stream to completion into a memory sink
    and return the materialized result."""
    name = f"stream_out_{next(_COUNTER)}"
    q = (stream_df.writeStream.outputMode(mode)
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embed-on-arrival (raw signed-count signature, exactly
    the batch `embed_text` semantics)."""
    from ..functions.embed import hash_embed_expr
    docs = (spark.readStream.format("parquet").schema(DOCS_SCHEMA)
            .option("pathGlobFilter", "documents.parquet").load(sf_dir))
    return docs.select("doc_id",
                       hash_embed_expr("text", normalized=False)
                       .cast("array<bigint>").alias("vec"))
