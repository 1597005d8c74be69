"""Parquet loaders for the star schema test tables.

Columnar parquet scans are the engine's canonical source: Catalyst
pushes filters and prunes columns into the scan (`PushedFilters` /
`ReadSchema` in `.explain`), which is what makes the same plans
viable at 100 TB — a query touching 2 of 11 lineitem columns reads
2 columns' worth of bytes, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as epoch-nanos int64 instead. Set at
        # runtime so it works under the driver's own SparkSession too.
        # Temporal operators derive buckets from the int64 directly —
        # integer arithmetic is also the only representation that is
        # bit-exact across engines (the DuckDB oracles use epoch_ns(ts)).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
