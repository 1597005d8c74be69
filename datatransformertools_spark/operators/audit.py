"""Schema-wide data audits a pipeline runs before trusting a drop.

- ``key_skew_profile`` — the skew detector that decides WHERE the
  scale levers go: per join/grouping key, exact row count, distinct
  count, the heaviest key's share, and the skew factor
  (max/avg rows per key). A skew factor near 1 means plain hash
  shuffles are fine; a heavy tail is the signal to salt that join
  (``events_skew_join_salted``) or lean on AQE skew splitting.
- ``referential_integrity_audit`` — orphan-key counts for every
  fact→dim edge of the star schema. Broken FKs silently drop rows
  in inner joins; this audit makes that loss visible before any
  query runs.

Both audits collapse each table to per-key counts FIRST (map-side
combined groupBy), so every later join/agg moves distinct keys —
never raw rows. That is the 100 TB shape: auditing a trillion-row
fact table shuffles |keys| longs per edge.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datatransformertools_spark.sources.tables import load_table

# (table, key column) pairs every big shuffle in the engine keys on.
SKEW_KEYS = (
    ("events", "user_id"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("documents", "source"),
)


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact skew profile of the engine's hot join/grouping keys.

    One map-side-combined groupBy per (table, key) collapses the
    table to per-key counts; a second |keys|-row agg yields
    n_rows / n_keys / max_per_key, and skew_factor = max/avg rows
    per key, 4-dp-quantized. The per-table passes are independent
    scans (column-pruned to the single key), unioned at one row per
    profile — output is O(|SKEW_KEYS|) regardless of data size."""

    def profile(table: str, key: str) -> DataFrame:
        per_key = (
            load_table(spark, sf_dir, table)
            .select(F.col(key).cast("string").alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return per_key.agg(
            F.lit(table).alias("table_name"),
            F.lit(key).alias("key_column"),
            F.sum("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_per_key"),
            F.round(F.max("n") * F.count(F.lit(1)) / F.sum("n") + 1e-9, 4).alias(
                "skew_factor"
            ),
        )

    return reduce(DataFrame.unionByName, (profile(t, k) for t, k in SKEW_KEYS))


def _skew_leg(table: str, key: str) -> str:
    return f"""
SELECT '{table}' AS table_name,
       '{key}'   AS key_column,
       CAST(sum(n) AS BIGINT)   AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(n) AS BIGINT)   AS max_per_key,
       round(max(n) * count(*) * 1.0 / sum(n) + 1e-9, 4) AS skew_factor
FROM (SELECT CAST({key} AS VARCHAR) AS k, count(*) AS n FROM {table} GROUP BY 1)"""


KEY_SKEW_PROFILE_SQL = "\nUNION ALL\n".join(_skew_leg(t, k) for t, k in SKEW_KEYS)


# Every fact→dim foreign-key edge of the star schema.
FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-row counts per foreign-key edge: how many fact rows
    reference a key absent from the dimension.

    Each edge collapses the fact side to (key, row_count) first, so
    the anti-join against the dimension's primary keys shuffles
    distinct keys carrying a long — orphan ROWS are recovered as
    sum(row_count) over orphan KEYS without ever moving fact rows.
    The dim side projects its single key column (pruned scan). One
    row out per edge."""

    def audit(fact: str, fk: str, dim: str, pk: str) -> DataFrame:
        fact_keys = (
            load_table(spark, sf_dir, fact)
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        dim_keys = load_table(spark, sf_dir, dim).select(F.col(pk).alias("k"))
        orphans = fact_keys.join(dim_keys, "k", "left_anti")
        return orphans.agg(
            F.lit(f"{fact}.{fk}").alias("fk_column"),
            F.lit(f"{dim}.{pk}").alias("references"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_orphan_rows"),
            F.count(F.lit(1)).alias("n_orphan_keys"),
        )

    return reduce(DataFrame.unionByName, (audit(*edge) for edge in FK_EDGES))


def _fk_leg(fact: str, fk: str, dim: str, pk: str) -> str:
    return f"""
SELECT '{fact}.{fk}' AS fk_column,
       '{dim}.{pk}'  AS references,
       CAST(coalesce(sum(n), 0) AS BIGINT) AS n_orphan_rows,
       CAST(count(*) AS BIGINT)            AS n_orphan_keys
FROM (
  SELECT {fk} AS k, count(*) AS n FROM {fact} GROUP BY 1
) f
WHERE k NOT IN (SELECT {pk} FROM {dim})"""


REFERENTIAL_INTEGRITY_SQL = "\nUNION ALL\n".join(_fk_leg(*e) for e in FK_EDGES)


QUERIES = {
    "key_skew_profile": (key_skew_profile, KEY_SKEW_PROFILE_SQL),
    "referential_integrity_audit": (referential_integrity_audit, REFERENTIAL_INTEGRITY_SQL),
}
