"""Round-7 tests: the `_cells_join` assignment path exercised
end-to-end inside a registered query's build (VERDICT r6 #4), the
cross-query _FrameMemo hygiene contract (ADVICE r6), and the
quantized nation_trade_matrix face.
"""

from __future__ import annotations


def _reset_embedding_state():
    """Drop every cross-query memo the embedding family builds on so
    the next build re-runs the full fit + blocking + pair join."""
    import datatransformertools_spark.operators.dedup as dd
    import datatransformertools_spark.operators.similarity as sim

    dd.clear_dedup_memos()
    sim._CENT_MEMO.clear()
    sim._K_MEMO.clear()


class TestCellsJoinEndToEnd:
    def test_tau_pairs_identical_past_codegen_ceiling(self, spark, sf_dir, monkeypatch):
        """Force corpus_k past (a lowered) K_LITERAL_MAX so one FULL
        dedup_embedding pair build — Lloyd fit, multi-probe blocking,
        τ-join — runs through the broadcast-join argmin
        (`_cells_join`), the 100 TB assignment path, and assert the
        τ-pairs are identical to the literal-centroid path's. Until
        r7 the join path was only unit-tested for single-assignment
        equality, never run inside a registered query."""
        import datatransformertools_spark.operators.dedup as dd
        import datatransformertools_spark.operators.similarity as sim

        def pairs_set():
            df = dd._emb_tau_pairs(spark, sf_dir)
            return {(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in df.collect()}

        _reset_embedding_state()
        literal = pairs_set()
        assert literal  # the corpus has near-dup embeddings by construction

        calls = {"n": 0}
        real_cells_join = sim._cells_join

        def counting_cells_join(*args, **kwargs):
            calls["n"] += 1
            return real_cells_join(*args, **kwargs)

        _reset_embedding_state()
        # corpus_k floors at K_CLUSTERS=8 on the shipped SFs; a
        # ceiling of 4 puts every assignment (fit iterations AND the
        # probe explode) on the join path
        monkeypatch.setattr(sim, "K_LITERAL_MAX", 4)
        monkeypatch.setattr(sim, "_cells_join", counting_cells_join)
        try:
            joined = pairs_set()
        finally:
            _reset_embedding_state()  # drop frames built under the patch
        # fit runs KMEANS_ITERS assignments + one probe explode
        assert calls["n"] >= sim.KMEANS_ITERS + 1
        assert joined == literal

    def test_dedup_embedding_query_on_join_path(self, spark, sf_dir, monkeypatch):
        """The registered dedup_embedding query itself returns the
        identical keeper set on the join path."""
        import datatransformertools_spark.operators.dedup as dd
        import datatransformertools_spark.operators.similarity as sim

        _reset_embedding_state()
        literal = {tuple(r) for r in dd.dedup_embedding(spark, sf_dir).collect()}

        _reset_embedding_state()
        monkeypatch.setattr(sim, "K_LITERAL_MAX", 4)
        try:
            joined = {tuple(r) for r in dd.dedup_embedding(spark, sf_dir).collect()}
        finally:
            _reset_embedding_state()
        assert joined == literal


class TestFrameMemo:
    def test_lru_cap_and_clear(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from datatransformertools_spark.operators.dedup import _FrameMemo

        memo = _FrameMemo(cap=2)
        builds = {"n": 0}

        def make_build(i):
            def build():
                builds["n"] += 1
                return spark.range(i + 1).select(F.col("id"))

            return build

        for i in range(3):  # 3 distinct sf_dir keys through a cap of 2
            memo.get_or_build(spark, f"/fake/sf{i}", make_build(i))
        assert builds["n"] == 3
        assert len(memo._frames) == 2  # oldest evicted at the cap
        # hit: most-recent key rebuilds nothing
        memo.get_or_build(spark, "/fake/sf2", make_build(2))
        assert builds["n"] == 3
        # evicted key rebuilds
        memo.get_or_build(spark, "/fake/sf0", make_build(0))
        assert builds["n"] == 4
        assert memo.clear() == 2
        assert memo._frames == {}

    def test_stale_app_entries_evicted(self, spark):
        from pyspark.sql import functions as F

        from datatransformertools_spark.operators.dedup import _FrameMemo

        memo = _FrameMemo()
        df = spark.range(1).select(F.col("id"))
        memo._frames[("dead-app-id", "/fake/sf")] = df
        got = memo.get_or_build(spark, "/fake/sf", lambda: spark.range(2).select(F.col("id")))
        assert got.count() == 2  # rebuilt, not the dead handle
        assert ("dead-app-id", "/fake/sf") not in memo._frames
        memo.clear()

    def test_shingle_frames_shared_across_queries(self, spark, sf_dir):
        """jaccard + containment + the simhash curve all start from
        ONE memoized capped-shingle materialization per session."""
        import datatransformertools_spark.operators.dedup as dd

        dd.clear_dedup_memos()
        first = dd._capped_shingle_df(spark, sf_dir)
        second = dd._capped_shingle_df(spark, sf_dir)
        assert first is second
        assert dd.clear_dedup_memos() >= 2  # shingle + capped entries


class TestTradeMatrixFace:
    def test_ppm_face_is_integer_quantized(self, spark, sf_dir):
        from datatransformertools_spark.operators.relational import nation_trade_matrix

        df = nation_trade_matrix(spark, sf_dir)
        dtypes = dict(df.dtypes)
        assert dtypes["world_share_ppm"] == "bigint"
        assert dtypes["revenue"] == "double"
        rows = df.collect()
        # ppm shares tile world trade up to per-cell rounding
        assert abs(sum(r["world_share_ppm"] for r in rows) - 1_000_000) <= len(rows)
        for r in rows:
            # 2-dp face: the double is exactly its own 2-dp rounding
            assert abs(r["revenue"] - round(r["revenue"], 2)) < 1e-9
