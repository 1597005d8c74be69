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
_FAMILY: dict[str, str] = {}  # query name → operator family (module short name)


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
        family = "streaming" if ".streaming." in mod_name else mod_name.rsplit(".", 1)[-1]
        for name, pair in getattr(mod, "QUERIES", {}).items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r} from {mod_name}")
            merged[name] = pair
            _FAMILY[name] = family
    # r8 gate rotation (VERDICT r7 #1/#2/#3/#4): the driver's
    # correctness gate records the FIRST 50 registry entries. The r8
    # head is every row whose face or Spark internals changed this
    # round: (1) the FIVE watermark-bound streaming twins (complete
    # mode → update/append with state eviction — the r7 scale-killer
    # fix, extended to tumbling/hopping so ZERO complete-mode
    # queries remain in the registry); (2) `template_prefix_families`
    # with the honest n_chars_raw/total_chars_raw column names (face
    # change, both engines); (3) `embedding_silhouette` with the
    # single-label least() guard; (4) the three kNN-family consumers
    # now sharing the memoized `_knn_edges` stage table; (5) the
    # seventeen new r8 operators (house rule: certify in the round
    # they land). Then freshness refill — ALL 17 remaining
    # r1-certified rows plus the 6 oldest r2-certified rows (34 r2
    # rows remain for the r9 window; 58 stale rows did not fit one
    # 50-slot window alongside the changed-row and new-op
    # certifications).
    # Every row passes
    # the identical dtype-strict gate locally via
    # tests/test_oracle_parity.py.
    queue_head = [
        # watermark-bound streaming twins — changed implementations
        "events_stream_bitmap_rollup",
        "events_stream_top_k_per_window",
        "events_stream_sessionize",
        "events_stream_tumbling",
        "events_stream_hopping",
        # face rename (n_chars_raw / total_chars_raw, both engines)
        "template_prefix_families",
        # single-label guard in least()
        "embedding_silhouette",
        # Spark internals moved to the shared _KNN_EDGES_MEMO stage
        "embedding_knn_graph",
        "embedding_knn_outlier",
        "embedding_intrinsic_dim",
        # new in r8 — certify in the round they land (house rule)
        "events_stream_session_timeout",
        "events_session_gap_audit",
        "events_session_stats",
        "events_dau_mau_stickiness",
        "doc_encoding_audit",
        "corpus_filter_ablation",
        "minhash_perm_error_curve",
        "simhash_bit_balance_audit",
        "dup_quality_interaction",
        "vocab_heaps_law",
        "embedding_pq_distortion",
        "shard_source_mix_audit",
        "cms_width_error_curve",
        "ann_ivf_cell_balance",
        "session_gap_threshold_curve",
        "neardup_detector_overlap",
        "winnowing_density_audit",
    ]
    # Freshness refill: oldest certifications first (every r1 row,
    # then the oldest r2 rows) so no row's evidence stays frozen at
    # its first green.
    refill = [
        # --- all remaining r1-certified rows (17) ---
        "detection_eval",
        "detection_eval_macro",
        "detection_eval_per_class",
        "detection_eval_sweep",
        "batch_inference",
        "multimodal_manifest",
        "ann_bruteforce_topk",
        "ann_ivf_topk",
        "ann_lsh_topk",
        "corpus_prep_pipeline",
        "doc_fingerprint",
        "doc_tfidf_topk",
        "lang_id",
        "ngram_topk",
        "text_quality",
        "text_stats",
        "token_count_bpe",
        # --- oldest r2-certified rows (22 of 40) ---
        "q3_top_unshipped",
        "q5_region_revenue",
        "q7_volume_shipping",
        "q8_market_share",
        "q10_returned_items",
        "q12_priority_shipmode",
        "q13_customer_distribution",
        "q17_small_qty_revenue",
        "q18_large_orders",
        "q21_waiting_suppliers",
        "q22_global_sales_opportunity",
        "events_tumbling_agg",
        "events_sessionize",
        "events_asof_join",
        "events_funnel",
        "events_json_extract",
        "events_top_k_per_window",
        "events_multi_rollup",
        "events_range_join_binned",
        "events_user_mad",
        "events_value_quantiles",
    ]
    head = queue_head + refill[: 50 - len(queue_head)]
    if len(head) != 50:
        raise RuntimeError(f"gate rotation head must be exactly 50, got {len(head)}")
    missing = [n for n in head if n not in merged]
    if missing:
        raise RuntimeError(f"rotation names not in registry: {missing}")
    ordered = {n: merged[n] for n in head}
    # everything else (driver-certified in r1-r5) sits past the
    # horizon in module order
    ordered.update({n: merged[n] for n in merged if n not in ordered})
    _CACHE = ordered
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _load().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _load().items() if sql is not None}


def families() -> dict[str, str]:
    """Query name → operator family (bench.py's rollup key)."""
    _load()
    return dict(_FAMILY)
