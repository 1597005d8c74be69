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
    # r3 ZERO-OVERLAP gate rotation (VERDICT r2 #1): the driver's
    # correctness gate records the FIRST 50 registry entries, so the
    # non-deferred head is exactly (a) queries new or semantically
    # changed this round (AP family, sketch error companions, I/O
    # round-trips, the DF-capped jaccard/containment + lsh_quality)
    # and (b) operators that have never had a driver-certified row.
    # Everything with r1/r2 gate-green evidence — plus 17 simple
    # window/agg ops still uncertified but locked by the local
    # oracle-parity replica (events_rolling_avg, events_cube,
    # user_value_deciles, events_latest_snapshot, events_gap_fill,
    # orders_percent_rank, events_user_entropy,
    # events_transition_matrix, events_anomaly_zscore, customer_rfm,
    # orders_market_basket, doc_bm25_topk, vocab_topk,
    # doc_unigram_logprob, events_column_profile,
    # dedup_rate_by_source, orders_association_rules; first in line
    # for the r4 window) — is deferred past the horizon.
    deferred = [
        "events_tumbling_agg",
        "events_sessionize",
        "events_asof_join",
        "events_json_extract",
        "events_skew_join_salted",
        "events_user_mad",
        "events_top_k_per_window",
        "events_range_join_binned",
        "events_multi_rollup",
        "events_funnel",
        "orders_cohort_retention",
        "events_value_quantiles",
        "events_hopping_agg",
        "events_user_count_hll",
        "events_stream_tumbling",
        "events_stream_sessionize",
        "events_stream_dedup",
        "q3_top_unshipped",
        "q7_volume_shipping",
        "q10_returned_items",
        "q12_priority_shipmode",
        "q18_large_orders",
        "q5_region_revenue",
        "top_customers_window",
        "q8_market_share",
        "q9_profit_by_nation",
        "q13_customer_distribution",
        "q17_small_qty_revenue",
        "q21_waiting_suppliers",
        "q22_global_sales_opportunity",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding",
        "dedup_components",
        "pii_scrub",
        "contamination_check",
        "stratified_sample",
        "corpus_mix_summary",
        "pack_sequences",
        "label_centroids",
        "kmeans_embeddings",
        "embedding_quantize",
        "repetition_stats",
        "doc_chunk_windows",
        "token_length_histogram",
        "pdf_to_pages",
        "dataset_stats",
        "detection_eval_greedy",
        "orders_association_rules",
        "events_rolling_avg",
        "doc_unigram_logprob",
        "vocab_topk",
        "events_cube",
        "user_value_deciles",
        "events_latest_snapshot",
        "events_gap_fill",
        "orders_percent_rank",
        "events_user_entropy",
        "events_transition_matrix",
        "customer_rfm",
        "orders_market_basket",
        "doc_bm25_topk",
        "events_anomaly_zscore",
        "dedup_rate_by_source",
        "events_column_profile",
        "doc_tfidf_topk",
        "q2_min_cost_supplier",
        "part_brand_pivot",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q19_discounted_revenue",
        "corpus_prep_pipeline",
        "text_stats",
        "ngram_topk",
        "text_quality",
        "lang_id",
        "token_count_bpe",
        "doc_fingerprint",
        "multimodal_manifest",
        "batch_inference",
        "ann_bruteforce_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "yolo_normalize",
        "yolo_denormalize",
        "train_val_split",
        "class_map",
        "bbox_iou_pairs",
        "detection_eval",
        "detection_eval_per_class",
        "detection_eval_macro",
        "detection_eval_sweep",
        "q1_pricing_summary",
        "q6_forecast_revenue",
        "orders_rollup",
        "revenue_yoy_growth",
        "order_priority_exists",
        # --- new in r3: uncertified, queued for the r4 gate window
        # (appending keeps the r3 head at exactly the 50 planned
        # never-certified slots) ---
        "pmi_bigrams",
        "token_fertility",
        "paragraph_dedup",
        "cross_source_overlap",
        "events_ewma",
        "events_ohlc",
        "embedding_covariance",
        "minhash_band_curve",
        "dedup_cluster_sizes",
        "documents_jsonl_roundtrip",
        "orders_upsert_merge",
        "user_event_features",
        "events_attribution",
        "oov_rate_by_source",
        "part_label_propagation",
        "orders_csv_roundtrip",
        "events_stream_ewma",
        "events_heavy_hitters_cms",
        "events_user_count_hll_manual",
        "gopher_quality_filter",
        "doc_length_percentile_filter",
        "word_zipf_slope",
        "events_autocorr",
        "events_cusum",
        "user_value_gini",
        "dedup_minhash_verify",
        "knn_label_eval",
        "orders_interarrival",
        "part_revenue_pareto",
        "audio_frame_energy",
        "bpe_train_merges",
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
    ]
    ordered = {n: merged[n] for n in merged if n not in deferred}
    ordered.update({n: merged[n] for n in deferred if n in merged})
    _CACHE = ordered
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _load().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _load().items() if sql is not None}
