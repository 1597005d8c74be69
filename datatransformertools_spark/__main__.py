"""Command-line entry point — the distributed twin of the
reference's script-per-task CLI (converter_to_yolo_data.py,
predictions_to_json.py each run standalone; here every registered
operator runs the same way):

    python -m datatransformertools_spark list
    python -m datatransformertools_spark run q1_pricing_summary --sf /root/testdata/sf0.01
    python -m datatransformertools_spark run dedup_exact --sf /root/testdata/sf0.01 \\
        --output /tmp/deduped --format parquet
    python -m datatransformertools_spark explain events_asof_join
    python -m datatransformertools_spark sql \
        "SELECT source, count(*) FROM documents GROUP BY 1" --sf /root/testdata/sf0.01

`run` without --output prints up to --limit rows; with --output it
writes the full result (parquet/csv/json) — nothing ever collects
the complete result to the driver.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="datatransformertools_spark",
        description="Run registered operators of the PySpark analytics engine.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list every registered query name")

    run = sub.add_parser("run", help="execute one query")
    run.add_argument("query", help="query name (see `list`)")
    run.add_argument("--sf", default="/root/testdata/sf0.01", help="table directory")
    run.add_argument("--limit", type=int, default=20, help="rows to print (no --output)")
    run.add_argument("--output", default=None, help="write result here instead of printing")
    run.add_argument(
        "--format", default="parquet", choices=("parquet", "csv", "json"), help="output format"
    )

    exp = sub.add_parser("explain", help="print a query's physical plan")
    exp.add_argument("query")
    exp.add_argument("--sf", default="/root/testdata/sf0.01")
    exp.add_argument(
        "--hints-only",
        action="store_true",
        help="disable AQE + size-based auto-broadcast first, so every "
        "BroadcastExchange shown comes from an explicit hint — the "
        "plan shape that holds at any scale",
    )

    sql = sub.add_parser(
        "sql",
        help="run ad-hoc Spark SQL over the registered tables "
        "(region nation customer supplier part orders lineitem "
        "events documents embeddings as temp views)",
    )
    sql.add_argument("query", help="SQL text, or '-' to read it from stdin")
    sql.add_argument("--sf", default="/root/testdata/sf0.01", help="table directory")
    sql.add_argument("--limit", type=int, default=20, help="rows to print (no --output)")
    sql.add_argument("--output", default=None, help="write result here instead of printing")
    sql.add_argument(
        "--format", default="parquet", choices=("parquet", "csv", "json"), help="output format"
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from datatransformertools_spark import registry

    queries = registry.queries()
    if args.cmd == "list":
        for name in queries:
            print(name)
        return 0

    if args.cmd == "sql":
        from datatransformertools_spark.session import get_spark
        from datatransformertools_spark.sources.tables import TABLE_NAMES, load_table

        text = sys.stdin.read() if args.query == "-" else args.query
        spark = get_spark("dtt-cli-sql")
        spark.sparkContext.setLogLevel("ERROR")
        for t in TABLE_NAMES:
            load_table(spark, args.sf, t).createOrReplaceTempView(t)
        df = spark.sql(text)
    else:
        if args.query not in queries:
            print(f"unknown query {args.query!r}; `list` shows the registry", file=sys.stderr)
            return 2

        from datatransformertools_spark.session import get_spark

        spark = get_spark(f"dtt-cli-{args.cmd}")
        spark.sparkContext.setLogLevel("ERROR")
        if args.cmd == "explain" and args.hints_only:
            # pin the confs BEFORE the (only) planning pass
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = queries[args.query](spark, args.sf)

    if args.cmd == "explain":
        print(df._jdf.queryExecution().executedPlan().toString())
        return 0

    if args.output:
        writer = df.write.mode("overwrite")
        if args.format == "parquet":
            writer.parquet(args.output)
        elif args.format == "csv":
            writer.option("header", "true").csv(args.output)
        else:
            writer.json(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
