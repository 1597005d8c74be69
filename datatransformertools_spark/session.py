"""SparkSession builder tuned for the engine.

Scale notes: these configs are the local[*] mirror of what we'd set
on a 1000-executor cluster — AQE on (runtime re-plan + skew-join
splitting), UTC session time zone (oracle parity + determinism),
Arrow enabled for the few Pandas-UDF paths, and a shuffle
partition count sized to the local core count (on a real cluster
AQE coalesces post-shuffle partitions anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "datatransformertools-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
