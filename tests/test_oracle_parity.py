"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compare row counts,
column names, and order-insensitive values.

Keeping this green keeps CORRECTNESS_r{N}.json green by
construction.
"""

from __future__ import annotations

import duckdb
import pytest

from datatransformertools_spark import registry
from datatransformertools_spark.sources.tables import TABLE_NAMES
from tools.canon import canon_rows as _canon_rows
from tools.canon import dtype_mismatches

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    sdf = _QUERIES[name](spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(_ORACLES[name])
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    # dtype-strict like the driver's value hash: an uncast integer
    # sum() in the oracle (DuckDB HUGEINT) must fail HERE, not in
    # CORRECTNESS_r{N}.json (the r2/r4 red-row class).
    bad = dtype_mismatches(sdf.dtypes, d_cols, [str(t) for t in rel.types])
    assert not bad, f"{name}: dtype class mismatch: {bad}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    s_canon = _canon_rows(s_cols, s_rows)
    d_canon = _canon_rows(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:5]
    assert s_canon == d_canon, f"{name}: value mismatch, first diffs: {mism}"


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in _QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
