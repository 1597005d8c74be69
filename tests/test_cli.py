"""CLI surface: list / run / explain / sql drive the same registry
and session the driver uses."""

from __future__ import annotations

from datatransformertools_spark.__main__ import main


def test_cli_list(capsys, spark):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "q1_pricing_summary" in out
    assert len(out) >= 235


def test_cli_sql_over_registered_tables(capsys, spark, sf_dir):
    rc = main(
        [
            "sql",
            "SELECT r_name FROM region ORDER BY r_name LIMIT 1",
            "--sf",
            sf_dir,
        ]
    )
    assert rc == 0
    assert "AFRICA" in capsys.readouterr().out


def test_cli_explain(capsys, spark, sf_dir):
    assert main(["explain", "q6_forecast_revenue", "--sf", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "FileScan parquet" in out


def test_cli_explain_hints_only(capsys, spark, sf_dir):
    assert main(["explain", "q5_region_revenue", "--sf", sf_dir, "--hints-only"]) == 0
    out = capsys.readouterr().out
    # only the two fixed-size dim hints survive with AQE off
    assert out.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" in out
