"""Structured Streaming mirrors of the batch temporal operators.

Same windowing semantics as ``operators/events.py``, expressed over
``readStream`` so the identical logical plan serves both bounded
backfill and live ingestion — the Spark way to run one codebase at
100 TB batch + streaming.

Design notes for the cluster:
- event-time windows + watermark bound the state store; late rows
  beyond the watermark are dropped deterministically;
- the aggregation is keyed by (window, event_type) so state
  partitions across executors;
- sinks go through ``writeStream`` with checkpointing; tests use
  ``trigger(availableNow=True)`` + a memory sink to drain a bounded
  file source and compare against the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over events parquet (ts as epoch-nanos
    int64, same representation as the batch reader)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    return raw.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))


def stream_tumbling_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """5-minute tumbling window counts/sums with a watermark —
    the streaming twin of ``events_tumbling_agg``."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "5 minutes"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint_dir: str):
    """Drain all available input with availableNow and park results
    in a memory sink (test/backfill harness)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
