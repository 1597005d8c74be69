"""Physical-plan assertions — the scale contract.

Correctness tests prove the answers match; these prove the PLANS are
the ones that survive 100 TB: filters reach the parquet scan, column
pruning holds, dimension joins broadcast instead of shuffling the
fact table, and per-row operators stay shuffle-free. A regression
here is a performance bug even when every value still matches.
"""

from __future__ import annotations

import re

from datatransformertools_spark import registry

_QUERIES = registry.queries()


def _plan(spark, sf_dir, name: str) -> str:
    return _QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q6_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # filter pushed into the scan
    assert "PushedFilters: [" in scan and "l_shipdate" in scan.split("PushedFilters")[1]
    # column pruning: the 11-column lineitem scan reads exactly the 4 used
    cols = re.search(r"FileScan parquet \[([^\]]*)\]", scan).group(1)
    assert len(cols.split(",")) == 4, cols


def test_q5_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_text_ops_are_shuffle_free(spark, sf_dir):
    for name in ("text_stats", "text_quality", "lang_id", "token_count_bpe", "doc_fingerprint"):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"


def test_dedup_exact_single_shuffle_no_text(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_exact")
    assert plan.count("Exchange") == 1
    # the exchange moves (hash, doc_id) — never the text column
    exchange_line = next(l for l in plan.splitlines() if "Exchange" in l)
    assert not re.search(r"\btext#\d", exchange_line), exchange_line


def test_ann_bruteforce_broadcasts_queries(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ann_bruteforce_topk")
    # the tiny query side must broadcast; a shuffled cartesian is the
    # plan that dies at scale
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_salted_join_no_skew_single_key(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_skew_join_salted")
    # join key must include the salt column, not user_id alone
    join_line = next(l for l in plan.splitlines() if "Join" in l and "salt" in l)
    assert join_line
