"""Structured Streaming over the `events` table.

The reference is batch-only (SURVEY.md §2.8); this module adds the
streaming expression of the same temporal aggregations: file-source
readStream → watermarked tumbling-window aggregation → sink. The batch
queries in operators/timeseries.py are the semantic oracle — a
bounded-input stream (availableNow trigger) must produce exactly the batch
answer, which is how the driver's DuckDB check validates st1.

Scale notes: in production the source is a queue (Kafka) or an Iceberg
table scanned incrementally by snapshot; the watermark bounds state for
late data; sinks are exactly-once via checkpointing. All of that is
config on the same logical plan shown here.
"""

from __future__ import annotations

import itertools
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_spark.registry import register
from apache_iceberg_spark.tables import load_table

_stream_ids = itertools.count()


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table.

    The static read supplies the (pre-conversion) schema — a streaming
    source requires one; nanos→µs conversion matches tables.load_table.
    """
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream


def tumbling_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling aggregation (streaming form of
    ts1_tumbling_agg)."""
    return (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def run_stream_to_memory(streaming_df: DataFrame, name_prefix: str = "stream") -> str:
    """Run a bounded stream to completion into an in-memory sink
    (availableNow trigger); returns the result table name."""
    qname = f"{name_prefix}_{next(_stream_ids)}"
    query = (
        streaming_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return qname


@register(
    "st1_stream_tumbling",
    oracle="""
        SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents
        FROM events
        GROUP BY 1, 2
    """,
    doc="End-to-end Structured Streaming: file source → watermark → "
    "tumbling-window agg → availableNow run → memory sink. The bounded "
    "stream must reproduce the batch answer exactly — the oracle is the "
    "same SQL that checks the batch operator ts1.",
    tags=("streaming", "timeseries"),
)
def st1_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    qname = run_stream_to_memory(
        tumbling_counts_stream(spark, sf_dir), "st1_tumbling"
    )
    return spark.table(qname)
