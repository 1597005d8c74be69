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


# Registered schemas the driver gate is known to canonicalize: only
# scalar top-level columns. An array/struct/map column makes the
# driver's pandas sort_values throw `unhashable type: 'list'` (the
# r5 `tokenize_to_ids` red-row class) even though the local gate
# stringifies arrays — so the ban is enforced HERE, locally, the
# same way test_canon.py made the HUGEINT class a local failure.
# A query needing to certify array CONTENT registers a digest face
# (md5 of the joined elements) and keeps the array variant internal.
_DRIVER_SAFE_COMPLEX: set[str] = set()  # (name, col) pairs, none today


def test_all_queries_return_rows(spark, sf_dir):
    import re

    complex_re = re.compile(r"^(array|struct|map)<")
    for name, fn in _QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        bad = [
            (col, dt)
            for col, dt in df.dtypes
            if complex_re.match(dt) and (name, col) not in _DRIVER_SAFE_COMPLEX
        ]
        assert not bad, (
            f"{name}: registered schema exposes complex column(s) {bad} — "
            "the driver canonicalizer cannot hash them; register a digest "
            "face instead (see tokenize_to_ids)"
        )


# The steady-state rows-only set: exactly these four ops ship with
# no SQL oracle (engine-internal sketch state / numpy eigh), and
# each one's CONTRACT is value-gated through the named certified
# companion. Pinning the set means a future op cannot silently ship
# rows-only — it either gets an oracle or is added here with a
# companion, explicitly.
_ROWS_ONLY_COMPANIONS = {
    "events_user_count_hll": "events_user_count_hll_error",
    "events_value_quantiles_sketch": "events_value_quantiles_sketch_error",
    "embedding_pca_project": "embedding_pca_invariants",
    "embedding_whitening": "embedding_whiten_invariants",
}


def test_rows_only_set_pinned():
    rows_only = set(_QUERIES) - set(_ORACLES)
    assert rows_only == set(_ROWS_ONLY_COMPANIONS), (
        f"rows-only registry drift: {sorted(rows_only ^ set(_ROWS_ONLY_COMPANIONS))}"
    )
    for op, companion in _ROWS_ONLY_COMPANIONS.items():
        assert companion in _ORACLES, f"{op}: companion {companion} has no oracle"


def test_gate_rotation_head_is_exact():
    """The driver certifies only the FIRST 50 registry entries, so
    the rotation math must be exact and self-consistent with the
    comments in registry.py (ADVICE r8: a miscounted refill comment
    mis-plans the next window): the window is 50 unique names, the
    r11 head leads it, and the refill is the 45 r4-certified rows
    plus the alphabetically-first r5 rows (after this window no
    certification is older than r5 — VERDICT r10 #1)."""
    window = list(_QUERIES)[:50]
    assert len(set(window)) == 50
    r11_head = [
        # new in r11 — the composed curation chain, its per-stage
        # funnel audit, and the reverse-direction decontamination
        # report; certify in the round they land
        "corpus_curation_pipeline",
        "curation_funnel",
        "benchmark_leak_report",
    ]
    assert window[: len(r11_head)] == r11_head
    # refill = 45 r4 rows + 2 r5 rows, disjoint from the head
    assert len(window) - len(r11_head) == 47
    # the r4-certified freshness targets (head of the VERDICT r10
    # list) must all sit in the refill
    for stale in (
        "dedup_cluster_sizes",
        "dedup_rate_by_source",
        "detection_eval_ap_coco",
        "doc_bm25_topk",
        "word_zipf_slope",  # alphabetical tail of the 45
    ):
        assert stale in window[len(r11_head) :], stale
    # the first pre-staged r5 rows fit after the 45
    for r5row in ("ann_ivf_pq_topk", "ann_range_search"):
        assert r5row in window[len(r11_head) :], r5row
    assert "bloom_join_prune" not in window  # 51st name — next round's refill head
