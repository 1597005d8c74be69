"""Parquet loaders for the star schema test tables.

Columnar parquet scans are the engine's canonical source: Catalyst
pushes filters and prunes columns into the scan (`PushedFilters` /
`ReadSchema` in `.explain`), which is what makes the same plans
viable at 100 TB — a query touching 2 of 11 lineitem columns reads
2 columns' worth of bytes, not the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) and
        # TIMESTAMP(MICROS) across testdata generations. NANOS is
        # unreadable by the vectorized reader unless mapped to int64,
        # so keep that mapping on; MICROS reads natively as
        # timestamp_ntz. Temporal operators normalize either shape to
        # epoch-µs int64 via events_ts_us() — integer µs is the one
        # representation that is bit-exact across engines (the DuckDB
        # oracles use epoch_us(ts)).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_ts_us(df: DataFrame) -> Column:
    """Epoch-microseconds int64 for events.ts, robust to how the
    parquet physical type materialized: epoch-nanos int64 (NANOS +
    nanosAsLong) divides by 1000; timestamp/timestamp_ntz (MICROS)
    converts exactly via unix_micros under the UTC session zone.
    Pure column arithmetic either way — stays in whole-stage codegen."""
    dtype = dict(df.dtypes).get("ts")
    if dtype in ("bigint", "long"):
        return F.expr("ts div 1000")
    return F.unix_micros(F.col("ts").cast("timestamp"))


def events_event_time(df: DataFrame) -> Column:
    """events.ts as a proper TIMESTAMP column (for event-time windows
    and watermarks), robust to the same two physical shapes."""
    dtype = dict(df.dtypes).get("ts")
    if dtype in ("bigint", "long"):
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
