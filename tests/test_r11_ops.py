"""Round-11 additions: isolation-time bench drift sampling and the
composed corpus curation pipeline."""

from __future__ import annotations


def test_bench_prev_name_drift_prefers_per_entry_stamp():
    """VERDICT r10 #1: isolated movers must band against the drift
    their PREVIOUS numbers were measured under. r11+ artifacts stamp
    `iso_drift` per entry (sampled immediately before that entry's
    fresh-JVM run); older artifacts only carry the run-wide
    `drift_used`, which sampled ambience mid-suite — hours before
    the end-of-suite isolated pass it was used to band."""
    from bench import _prev_name_drift

    # per-name stamp wins over the run-wide fallback
    assert _prev_name_drift({"cold": 10.0, "iso_drift": 1.46}, 1.072) == 1.46
    # legacy artifact rows (no stamp) fall back to run-wide
    assert _prev_name_drift({"cold": 10.0}, 1.072) == 1.072
    # a zero/absent stamp never divides by zero downstream
    assert _prev_name_drift({"iso_drift": 0.0}, 1.2) == 1.2
    assert _prev_name_drift({}, 1.0) == 1.0


def test_curation_pipeline_stage_invariants(spark, sf_dir):
    """Cross-stage consistency of the composed chain: every output
    row is a quality-passing keeper below the contamination cutoff,
    pack offsets tile each source's token stream exactly, and the
    shard key is in range."""
    from pyspark.sql import functions as F

    from datatransformertools_spark.operators.corpus import (
        CONTAM_TAU,
        CTX_LEN,
        CURATION_QUALITY_TAU,
        N_SHARDS,
        corpus_curation_pipeline,
    )

    df = corpus_curation_pipeline(spark, sf_dir)
    rows = df.collect()
    assert rows, "pipeline produced no survivors"
    for r in rows:
        assert r.quality_score >= CURATION_QUALITY_TAU
        assert 0.0 <= r.max_containment < CONTAM_TAU
        assert r.n_dups >= 0
        assert 0 < r.n_tokens and 0 <= r.n_oov <= r.n_tokens
        assert 0 <= r.shard < N_SHARDS
        assert r.window_id == r.start_offset // CTX_LEN
    # offsets tile: per source, sorted by doc_id, each start_offset
    # equals the previous start + its n_tokens (gapless packing)
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rs:
            assert r.start_offset == off, (src, r.doc_id)
            off += r.n_tokens
    # the pipeline's survivor set is a subset of the quality gate's
    # non-benchmark pass set, and smaller (dedup + decontamination
    # both fire on this corpus)
    from datatransformertools_spark.operators.corpus import BENCH_MOD
    from datatransformertools_spark.operators.text_analysis import quality_score_expr
    from datatransformertools_spark.sources.tables import load_table

    q_pass = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id", quality_score_expr().alias("q"))
        .filter(F.col("q") >= CURATION_QUALITY_TAU)
        .count()
    )
    assert len(rows) < q_pass, (len(rows), q_pass)


def test_funnel_agrees_with_pipeline(spark, sf_dir):
    """The funnel's final stage count must equal the composed
    pipeline's output row count — they read the same stage frames,
    so disagreement means the shared helper forked semantics."""
    from datatransformertools_spark.operators.corpus import (
        corpus_curation_pipeline,
        curation_funnel,
    )

    funnel = {r.stage: r.n_docs for r in curation_funnel(spark, sf_dir).collect()}
    n_out = corpus_curation_pipeline(spark, sf_dir).count()
    assert funnel["decontaminated"] == n_out, (funnel, n_out)
    # monotone non-increasing survivor counts down the chain
    order = ["corpus", "quality_pass", "dedup_keeper", "decontaminated"]
    counts = [funnel[s] for s in order]
    assert counts == sorted(counts, reverse=True), counts
    assert counts[-1] > 0
