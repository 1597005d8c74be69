"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compare row counts,
column names, and order-insensitive values.

Keeping this green keeps CORRECTNESS_r{N}.json green by
construction.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from datatransformertools_spark import registry
from datatransformertools_spark.sources.tables import TABLE_NAMES

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


def _canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round-trip floats through a fixed repr
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    sdf = _QUERIES[name](spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(_ORACLES[name])
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    s_canon = _canon_rows(s_cols, s_rows)
    d_canon = _canon_rows(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:5]
    assert s_canon == d_canon, f"{name}: value mismatch, first diffs: {mism}"


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in _QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
