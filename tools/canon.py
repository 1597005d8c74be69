"""Shared canonicalization + dtype checks for the local oracle-
parity gate (tests/test_oracle_parity.py and tools/parity_one.py).

The driver's value hash is dtype-sensitive: a DuckDB HUGEINT
(int128, what an uncast ``sum(BIGINT)`` produces) hashes differently
from Spark's ``long`` even when every value is equal — the class
that produced the r2 and r4 red gate rows. The local canonicalizer
stringifies values and so is blind to it; ``dtype_mismatches``
closes that gap by asserting the DuckDB result column types map to
the Spark schema, so the next HUGEINT leak fails locally first.
"""

from __future__ import annotations

import math
import re

# Spark simpleString dtype → the dtype CLASS both engines must agree
# on. Width differences inside a class (int vs bigint) canonicalize
# identically in the driver's numeric normalization; class crossings
# (int128/decimal vs int64, double vs int) do not.
_SPARK_CLASS = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
}

_DUCK_CLASS = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "HUGEINT": "int128",  # NEVER acceptable: driver hash class break
    "UHUGEINT": "int128",
    "FLOAT": "float",
    "REAL": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
}


def _spark_class(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "decimal" + re.sub(r"\s+", "", dt[len("decimal"):])
    if dt.startswith("array<"):
        return "list<" + _spark_class(dt[6:-1]) + ">"
    return _SPARK_CLASS.get(dt, dt)


def _duck_class(dt: str) -> str:
    dt = str(dt).upper()
    if dt.startswith("DECIMAL"):
        return "decimal" + re.sub(r"\s+", "", dt[len("DECIMAL"):]).lower()
    if dt.endswith("[]"):
        return "list<" + _duck_class(dt[:-2]) + ">"
    return _DUCK_CLASS.get(dt, dt.lower())


def dtype_mismatches(spark_dtypes, duck_cols, duck_types) -> list[str]:
    """Compare Spark (name, simpleString) pairs against DuckDB result
    column names/types by dtype CLASS; returns human-readable
    mismatch strings (empty = compatible). Columns are matched by
    name (the gate sorts by name before hashing)."""
    duck_by_name = {c: _duck_class(t) for c, t in zip(duck_cols, duck_types)}
    out = []
    for name, sdt in spark_dtypes:
        if name not in duck_by_name:
            continue  # column-set mismatch reported separately
        sc, dc = _spark_class(sdt), duck_by_name[name]
        if sc != dc:
            out.append(f"{name}: spark {sdt} ({sc}) vs duckdb {dc}")
    return out


def canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            v = 0.0  # IEEE -0.0 must hash like 0.0 (sign of a cancelled sum is engine noise)
        # Full-precision shortest round-trip repr (r7, VERDICT r6 #2):
        # the old truncating f"{v:.6f}" made the local gate blind to
        # any cross-engine drift below 6 dp — the only remaining way
        # local-green could differ from driver-green. repr(float) is
        # bit-exact on doubles, matching the driver's strictness.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)
