"""Generic source/sink round-trips + the bucketed-join scale proof."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from datatransformertools_spark.sources.sinks import (
    read_csv,
    read_jsonl,
    write_bucketed_table,
    write_partitioned_parquet,
)
from datatransformertools_spark.sources.tables import load_table


def test_csv_jsonl_roundtrip(spark, sf_dir):
    tmp = Path(tempfile.mkdtemp(prefix="dtt-io-"))
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(str(tmp / "csv"))
    nation.write.mode("overwrite").json(str(tmp / "jsonl"))

    schema = "n_nationkey int, n_name string, n_regionkey int"
    got_csv = read_csv(spark, str(tmp / "csv"), schema)
    got_jsonl = read_jsonl(spark, str(tmp / "jsonl"), schema)
    want = sorted(tuple(r) for r in nation.collect())
    assert sorted(tuple(r) for r in got_csv.collect()) == want
    assert sorted(tuple(r) for r in got_jsonl.collect()) == want
    shutil.rmtree(tmp, ignore_errors=True)


def test_partitioned_parquet_prunes(spark, sf_dir):
    tmp = Path(tempfile.mkdtemp(prefix="dtt-part-"))
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned_parquet(orders, str(tmp / "orders"), ["o_orderpriority"])

    one = spark.read.parquet(str(tmp / "orders")).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at planning time, not scan-then-filter
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split("PartitionFilters")[1]
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert one.count() == want
    shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(orders, "b_orders", "o_orderkey", 8)
    write_bucketed_table(li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)
    try:
        # disable broadcast so the join would otherwise sort-merge with exchanges
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cli_list_and_run(spark, sf_dir, capsys):
    from datatransformertools_spark.__main__ import main

    assert main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) > 100

    assert main(["run", "nope_not_a_query"]) == 2

    assert main(["run", "q14_promo_revenue", "--sf", sf_dir, "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "promo_revenue_pct" in out

    assert main(["explain", "q6_forecast_revenue", "--sf", sf_dir]) == 0
    assert "FileScan" in capsys.readouterr().out
