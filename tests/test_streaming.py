"""Structured Streaming drains the same events and agrees with the
batch plan — the one-codebase-two-runtimes guarantee."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from datatransformertools_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    stream_tumbling_agg,
)


def test_stream_matches_batch(spark, sf_dir):
    tmp = Path(tempfile.mkdtemp(prefix="dtt-stream-"))
    src = tmp / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")

    stream = read_events_stream(spark, str(src))
    assert stream.isStreaming
    agg = stream_tumbling_agg(stream)
    q = run_available_now(agg, "stream_tumbling", str(tmp / "ckpt"))
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in spark.sql("SELECT * FROM stream_tumbling").collect()
    }

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        spark.read.parquet(str(src))
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("event_time", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "s")
    )
    want = {(r["ws"], r["event_type"]): (r["n"], round(r["s"], 4)) for r in batch.collect()}

    assert got == want
    assert len(got) > 0
    shutil.rmtree(tmp, ignore_errors=True)
