"""Quick operator parity check: replicate the driver's gate for
the named queries (or the whole registry). Usage:

    python tools/parity_one.py name1 name2 ... [--sf 0.001]
    python tools/parity_one.py --all [--sf 0.1]

The full --all sweep at sf0.1 is the scale-up gate that caught the
trailing-1h µs-boundary and kcore oracle-inlining defects in r4 —
run it whenever operator semantics change.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import duckdb

from datatransformertools_spark import registry
from datatransformertools_spark.session import get_spark
from datatransformertools_spark.sources.tables import TABLE_NAMES
from tools.canon import canon_rows as _canon_rows
from tools.canon import dtype_mismatches


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "0.001"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf = sys.argv[1:][i + 1]
            args = [x for x in args if x != sf]
    sf_dir = f"/root/testdata/sf{sf}"
    qs, oracles = registry.queries(), registry.oracle_sql()
    if "--all" in sys.argv[1:]:
        args = sorted(qs)
    spark = get_spark("parity-one")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failed = 0
    for name in args:
        sdf = qs[name](spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: NO ORACLE — spark rows={len(s_rows)}")
            continue
        rel = con.sql(oracles[name])
        d_cols, d_rows = list(rel.columns), rel.fetchall()
        d_types = [str(t) for t in rel.types]
        ok_cols = sorted(s_cols) == sorted(d_cols)
        bad_dtypes = dtype_mismatches(sdf.dtypes, d_cols, d_types)
        sc, dc = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
        ok_rows = len(s_rows) == len(d_rows)
        ok_vals = sc == dc
        status = "OK" if (ok_cols and ok_rows and ok_vals and not bad_dtypes) else "FAIL"
        if status == "FAIL":
            failed += 1
        print(
            f"{name}: {status} rows={len(s_rows)}/{len(d_rows)} cols_match={ok_cols}"
            f" vals_match={ok_vals} dtypes_match={not bad_dtypes}"
        )
        if bad_dtypes:
            print("  dtype mismatches:", bad_dtypes)
        if not ok_cols:
            print("  spark cols:", s_cols, "\n  duck cols:", d_cols)
        if ok_cols and not ok_vals:
            diff_s = [r for r in sc if r not in set(dc)][:3]
            diff_d = [r for r in dc if r not in set(sc)][:3]
            print("  spark-only:", diff_s, "\n  duck-only:", diff_d)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
