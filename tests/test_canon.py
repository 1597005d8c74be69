"""Unit tests for tools/canon.py — the dtype-strict layer of the
local oracle-parity gate. The driver's value hash is dtype-class
sensitive (the r2/r4 red rows were DuckDB HUGEINT vs Spark long);
these pin the class mapping so the gate itself can't regress."""

from __future__ import annotations

from tools.canon import canon, canon_rows, dtype_mismatches


def _mm(spark_dtypes, duck_cols, duck_types):
    return dtype_mismatches(spark_dtypes, duck_cols, duck_types)


def test_hugeint_vs_bigint_flagged():
    assert _mm([("n", "bigint")], ["n"], ["HUGEINT"]) == [
        "n: spark bigint (int) vs duckdb int128"
    ]


def test_int_width_differences_ok():
    assert _mm([("n", "int")], ["n"], ["BIGINT"]) == []
    assert _mm([("n", "bigint")], ["n"], ["INTEGER"]) == []
    assert _mm([("n", "smallint")], ["n"], ["TINYINT"]) == []


def test_decimal_vs_double_flagged():
    assert _mm([("thr", "double")], ["thr"], ["DECIMAL(2,1)"]) != []


def test_decimal_matching_scale_ok():
    assert _mm([("d", "decimal(12,2)")], ["d"], ["DECIMAL(12,2)"]) == []


def test_float_int_cross_flagged():
    assert _mm([("v", "double")], ["v"], ["BIGINT"]) != []
    assert _mm([("v", "bigint")], ["v"], ["DOUBLE"]) != []


def test_common_scalar_classes_ok():
    pairs = [
        ("string", "VARCHAR"),
        ("double", "DOUBLE"),
        ("float", "REAL"),
        ("boolean", "BOOLEAN"),
        ("date", "DATE"),
        ("timestamp", "TIMESTAMP"),
        ("timestamp_ntz", "TIMESTAMP"),
    ]
    for sdt, ddt in pairs:
        assert _mm([("c", sdt)], ["c"], [ddt]) == [], (sdt, ddt)


def test_array_element_class_checked():
    assert _mm([("a", "array<double>")], ["a"], ["DOUBLE[]"]) == []
    assert _mm([("a", "array<bigint>")], ["a"], ["HUGEINT[]"]) != []


def test_missing_duck_column_not_reported_here():
    # column-set mismatches are the row/column gate's job
    assert _mm([("x", "bigint")], ["y"], ["HUGEINT"]) == []


def test_canon_float_formatting():
    # full-precision shortest round-trip repr (r7): the truncating
    # 6-dp canon made the local gate blind to sub-6-dp cross-engine
    # drift — the only remaining way local-green ≠ driver-green
    assert canon(0.5) == "0.5"
    assert canon(3.0) == "3.0"
    assert canon(None) == "<null>"
    assert canon(True) == "1"
    assert canon([1, 2.5]) == "[1,2.5]"


def test_canon_float_full_precision():
    # values differing past 6 dp MUST canon differently now
    assert canon(0.1234567) != canon(0.1234568)
    assert canon(1.0000000000000002) != canon(1.0)


def test_canon_negative_zero_normalized():
    # engines may disagree on the sign of a sum that cancels to zero
    assert canon(-0.0) == canon(0.0) == "0.0"


def test_canon_rows_column_order_insensitive():
    a = canon_rows(["b", "a"], [(2, 1)])
    b = canon_rows(["a", "b"], [(1, 2)])
    assert a == b
