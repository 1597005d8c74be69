"""Structured Streaming drains the same events and agrees with the
batch plan — the one-codebase-two-runtimes guarantee."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from datatransformertools_spark.sources.tables import events_event_time
from datatransformertools_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    stream_dedup,
    stream_session_agg,
    stream_to_parquet_idempotent,
    stream_tumbling_agg,
    stream_user_totals,
)


def test_stream_matches_batch(spark, sf_dir):
    tmp = Path(tempfile.mkdtemp(prefix="dtt-stream-"))
    src = tmp / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")

    stream = read_events_stream(spark, str(src))
    assert stream.isStreaming
    agg = stream_tumbling_agg(stream)
    q = run_available_now(agg, "stream_tumbling", str(tmp / "ckpt"))
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in spark.sql("SELECT * FROM stream_tumbling").collect()
    }

    raw_batch = spark.read.parquet(str(src))
    batch = (
        raw_batch
        .withColumn("event_time", events_event_time(raw_batch))
        .groupBy(F.window("event_time", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "s")
    )
    want = {(r["ws"], r["event_type"]): (r["n"], round(r["s"], 4)) for r in batch.collect()}

    assert got == want
    assert len(got) > 0
    shutil.rmtree(tmp, ignore_errors=True)


def _staged_events(sf_dir):
    tmp = Path(tempfile.mkdtemp(prefix="dtt-stream-"))
    src = tmp / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")
    return tmp, src


def test_stream_session_window_matches_batch(spark, sf_dir):
    tmp, src = _staged_events(sf_dir)
    stream = read_events_stream(spark, str(src))
    q = run_available_now(stream_session_agg(stream), "stream_sessions", str(tmp / "ckpt"))
    q.awaitTermination(120)
    got = {
        (r["session_start"], r["user_id"]): (r["n_events"], round(r["total_value"], 4))
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }

    raw_batch = spark.read.parquet(str(src))
    batch = (
        raw_batch
        .withColumn("event_time", events_event_time(raw_batch))
        .groupBy(F.session_window("event_time", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("session_window.start").alias("ws"), "user_id", "n", "s")
    )
    want = {(r["ws"], r["user_id"]): (r["n"], round(r["s"], 4)) for r in batch.collect()}
    assert len(got) > 0
    assert got == want
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_dedup_drops_resent_batch(spark, sf_dir):
    tmp, src = _staged_events(sf_dir)
    # the same file twice = an exactly-resent batch, the common
    # at-least-once-delivery case streaming dedup exists for
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-1.parquet")
    stream = read_events_stream(spark, str(src))
    q = run_available_now(stream_dedup(stream), "stream_dedup", str(tmp / "ckpt"), "append")
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM stream_dedup").first()
    n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert got["n"] == got["d"] == n_src
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_foreachbatch_parquet_sink(spark, sf_dir):
    tmp, src = _staged_events(sf_dir)
    out = tmp / "out"
    stream = read_events_stream(spark, str(src))
    agg = stream_tumbling_agg(stream)
    q = stream_to_parquet_idempotent(agg, str(out), str(tmp / "ckpt"))
    q.awaitTermination(120)
    # read the landed batch_id=* dirs back and compare to the batch plan
    landed = spark.read.option("basePath", str(out)).parquet(str(out) + "/batch_id=*")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in landed.collect()
    }
    raw_batch = spark.read.parquet(str(src))
    batch = (
        raw_batch
        .withColumn("event_time", events_event_time(raw_batch))
        .groupBy(F.window("event_time", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "s")
    )
    want = {(r["ws"], r["event_type"]): (r["n"], round(r["s"], 4)) for r in batch.collect()}
    assert got == want
    assert len(got) > 0
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_user_totals_stateful(spark, sf_dir):
    tmp, src = _staged_events(sf_dir)
    stream = read_events_stream(spark, str(src))
    q = run_available_now(stream_user_totals(stream), "stream_user_totals", str(tmp / "ckpt"), "update")
    q.awaitTermination(120)
    # update-mode memory sink may hold one row per microbatch per
    # user; the LAST emission per user is the running total
    rows = spark.sql("SELECT * FROM stream_user_totals").collect()
    got = {}
    for r in rows:
        got[r["user_id"]] = (r["n_events"], round(r["total_value"], 4))
    want = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in spark.read.parquet(str(src))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert len(got) > 0
    assert got == want
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_interval_join_boundary(spark):
    """The stream-stream attribution join uses CLOSED bounds: a
    purchase exactly 30 min after the click matches; one microsecond
    later does not."""
    import pandas as pd

    from datatransformertools_spark.streaming.events import events_stream_interval_join

    tmp = Path(tempfile.mkdtemp(prefix="dtt-ij-boundary-"))
    t0 = 1_700_000_000_000_000_000  # epoch nanos
    half_hour_ns = 1_800_000_000_000
    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [t0, t0 + half_hour_ns, t0 + half_hour_ns + 1000, t0 - 1000],
            "user_id": [7, 7, 7, 7],
            "event_type": ["click", "purchase", "purchase", "purchase"],
            "value": [0.0, 1.0, 2.0, 3.0],
            "props": ["{}"] * 4,
        }
    )
    rows.to_parquet(tmp / "events.parquet")
    got = events_stream_interval_join(spark, str(tmp)).collect()
    # only the exactly-at-boundary purchase joins (the +1us one is
    # past the upper bound; the earlier one precedes the click)
    assert len(got) == 1
    assert got[0]["user_id"] == 7
    assert got[0]["n_pairs"] == 1
    assert got[0]["total_lag_us"] == half_hour_ns // 1000
    shutil.rmtree(tmp, ignore_errors=True)


def test_checkpoint_freezes_state_partition_count(spark, sf_dir):
    """The documented DTT_STREAM_STATE_PARTITIONS invariant: the
    state-store layout is pinned to spark.sql.shuffle.partitions at
    FIRST checkpoint, and a later drain against the SAME checkpoint
    keeps the frozen count even when the session setting changed in
    between (a driver re-run with a different env must not corrupt
    or re-shard existing state). Also asserts the second drain picks
    up only the new file and the accumulated counts stay correct —
    i.e. state actually survived the re-open."""
    import json

    from datatransformertools_spark.streaming.events import _state_partitions

    tmp = Path(tempfile.mkdtemp(prefix="dtt-stream-frozen-"))
    src = tmp / "events"
    src.mkdir()
    ckpt = str(tmp / "ckpt")
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")

    def drain(n_parts, name):
        stream = read_events_stream(spark, str(src))
        agg = stream_tumbling_agg(stream)
        with _state_partitions(spark, n_parts):
            q = run_available_now(agg, name, ckpt)
            q.awaitTermination(120)
        return {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    first = drain(8, "frozen_a")
    assert first

    # second batch: the same rows again (a new file), then re-drain
    # with a DIFFERENT session shuffle setting against the same
    # checkpoint — counts must exactly double (state reloaded), and
    # the state layout must stay at the frozen 8.
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-1.parquet")
    second = drain(4, "frozen_b")
    assert second == {k: 2 * v for k, v in first.items()}

    # the offsets metadata of EVERY microbatch records the state
    # partition count the runtime actually used; all committed
    # batches must carry the count the checkpoint was created with.
    offsets_dir = Path(ckpt) / "offsets"
    counts = set()
    for f in offsets_dir.iterdir():
        if not f.name.isdigit():
            continue
        for line in f.read_text().splitlines():
            if line.startswith("{") and "shuffle.partitions" in line:
                meta = json.loads(line)
                counts.add(meta["conf"]["spark.sql.shuffle.partitions"])
    assert counts == {"8"}, counts
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_outer_interval_join_emits_null_rows(spark, sf_dir):
    """The left-outer interval join must emit clicks with NO
    purchase in-window (null-joined) once the watermark passes
    their horizon — and in the safe comparison region, matched +
    unmatched must account for every click."""
    from pyspark.sql import functions as F

    from datatransformertools_spark.sources.tables import events_ts_us, load_table
    from datatransformertools_spark.streaming.events import (
        _IJ_INTERVAL_US,
        _IJ_SAFE_SLACK_US,
        _IJ_WATERMARK_US,
        events_stream_interval_join_outer,
    )

    out = events_stream_interval_join_outer(spark, sf_dir)
    tot = out.agg(
        F.sum("n_matched").alias("m"), F.sum("n_unmatched").alias("u")
    ).collect()[0]
    assert tot["u"] > 0, "no null-joined clicks emitted"

    # every safe-region click is accounted for exactly once per
    # (click, matching purchase) pair or once as unmatched
    ev = load_table(spark, sf_dir, "events")
    ts = events_ts_us(ev)
    maxes = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type").agg(F.max(ts).alias("m")).collect()
    }
    wm = min(maxes["click"], maxes["purchase"]) - _IJ_WATERMARK_US
    cut = wm - _IJ_INTERVAL_US - _IJ_SAFE_SLACK_US
    clicks = ev.filter((F.col("event_type") == "click") & (ts <= F.lit(cut)))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), ts.alias("pus")
    )
    c = clicks.select("user_id", ts.alias("cus"))
    matched_pairs = c.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("pus") >= F.col("cus"))
        & (F.col("pus") <= F.col("cus") + _IJ_INTERVAL_US),
    ).count()
    unmatched_clicks = c.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("pus") >= F.col("cus"))
        & (F.col("pus") <= F.col("cus") + _IJ_INTERVAL_US),
        "left_anti",
    ).count()
    assert tot["m"] == matched_pairs
    assert tot["u"] == unmatched_clicks


def test_stream_bitmap_rollup_matches_batch(spark, sf_dir):
    """The streaming bit_or rollup must reproduce the batch bitmap
    table exactly — idempotent OR merge across microbatches is the
    whole argument for bitmaps as streaming state."""
    from datatransformertools_spark.operators.events import events_bitmap_rollup
    from datatransformertools_spark.streaming.events import events_stream_bitmap_rollup

    batch = {tuple(r) for r in events_bitmap_rollup(spark, sf_dir).collect()}
    stream = {tuple(r) for r in events_stream_bitmap_rollup(spark, sf_dir).collect()}
    assert stream == batch


def test_stream_top_k_matches_batch(spark, sf_dir):
    """Streaming per-(window, user) totals + bounded post-rank must
    equal the batch windowed top-k."""
    from datatransformertools_spark.operators.events import events_top_k_per_window
    from datatransformertools_spark.streaming.events import (
        events_stream_top_k_per_window,
    )

    batch = {tuple(r) for r in events_top_k_per_window(spark, sf_dir).collect()}
    stream = {tuple(r) for r in events_stream_top_k_per_window(spark, sf_dir).collect()}
    assert stream == batch


def test_watermark_evicts_state_and_closes_windows(spark, sf_dir):
    """The append-mode windowed aggregate must EVICT state once the
    watermark passes a window (VERDICT r7 #1's 'done' criterion):
    drain the real file and the far-future sentinel as SEPARATE
    microbatches (maxFilesPerTrigger=1) so the watermark advances
    between them, then assert (a) every real window was emitted
    exactly once (append = final), and (b) the state store reports
    rows REMOVED — the eviction itself, not just correct values."""
    import os
    import uuid

    from datatransformertools_spark.streaming.events import (
        SENTINEL_USER,
        _read_raw,
        _state_partitions,
        _write_watermark_sentinel,
        stream_window_user_totals,
    )

    tmp = Path(tempfile.mkdtemp(prefix="dtt-stream-evict-"))
    src = tmp / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    # sentinel written AFTER the copy → newer mtime → later batch
    _write_watermark_sentinel(str(src), sf_dir)
    raw = _read_raw(spark, str(src), maxFilesPerTrigger=1)
    per_user = stream_window_user_totals(
        raw.withColumn("event_time", events_event_time(raw))
    )
    name = f"evict_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            per_user.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        progresses = list(q.recentProgress)

    emitted = spark.table(name).filter(F.col("user_id") != SENTINEL_USER)
    raw_batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = (
        raw_batch.withColumn("event_time", events_event_time(raw_batch))
        .groupBy(F.window("event_time", "1 hour"), "user_id")
        .count()
        .count()
    )
    # (a) every real (window, user) emitted exactly once — closed final
    assert emitted.count() == want
    assert emitted.groupBy("window_start_us", "user_id").count().filter(
        F.col("count") > 1
    ).count() == 0
    # (b) the state store actually evicted rows when the watermark moved
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in progresses
        for op in (p.get("stateOperators") or [])
    )
    assert removed >= want, f"state rows removed {removed} < windows {want}"
    shutil.rmtree(tmp, ignore_errors=True)
    if os.path.exists(str(src)):
        shutil.rmtree(str(src), ignore_errors=True)


def test_bitmap_rollup_update_mode_state_bounded(spark, sf_dir):
    """The update-mode bitmap rollup must carry a watermark on its
    day-grain key (state evictable on an unbounded feed) and emit
    per-microbatch only touched keys. Two-batch drain (real file,
    then sentinel): batch 2 touches only the sentinel's key, so its
    update emission must be ≤ 1 row — NOT the whole table, which is
    what the replaced complete-mode twin re-emitted every batch."""
    import uuid

    from datatransformertools_spark.sources.tables import events_ts_us
    from datatransformertools_spark.streaming.events import (
        _read_raw,
        _state_partitions,
        _write_watermark_sentinel,
        stream_bitmap_rollup,
    )

    tmp = Path(tempfile.mkdtemp(prefix="dtt-stream-bmu-"))
    src = tmp / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    _write_watermark_sentinel(str(src), sf_dir)
    raw = _read_raw(spark, str(src), maxFilesPerTrigger=1)
    bm = stream_bitmap_rollup(raw.withColumn("ts_us", events_ts_us(raw)))
    name = f"bmu_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            bm.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        progresses = list(q.recentProgress)
    data_batches = [p for p in progresses if p.get("numInputRows", 0) > 0]
    assert len(data_batches) >= 2, "expected the two files to drain as separate batches"
    # batch 2 (sentinel only) must emit ≤ 1 updated row, not the table
    assert data_batches[-1]["sink"]["numOutputRows"] <= 1
    # watermark-driven eviction: real-day state removed once the
    # sentinel pushed the watermark past every real day
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in progresses
        for op in (p.get("stateOperators") or [])
    )
    assert removed > 0
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_dau_append_emits_each_day_once_and_evicts(spark, sf_dir):
    """The append-mode DAU chain (dedup → day-windowed count,
    VERDICT r8 #5): two-batch drain (real file, then sentinel) must
    (a) match the batch DAU exactly, (b) emit every day exactly once
    (append = final, no complete-mode re-emission), and (c) report
    state rows REMOVED from BOTH stateful operators once the
    sentinel pushes the watermark past the real days."""
    import uuid

    from datatransformertools_spark.sources.tables import events_ts_us
    from datatransformertools_spark.streaming.events import (
        _read_raw,
        _state_partitions,
        _write_watermark_sentinel,
    )

    day_us = 86_400_000_000
    tmp = Path(tempfile.mkdtemp(prefix="dtt-stream-dau-t-"))
    src = tmp / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    _write_watermark_sentinel(str(src), sf_dir)
    raw = _read_raw(spark, str(src), maxFilesPerTrigger=1)
    ev = raw.withColumn("ts_us", events_ts_us(raw)).withColumn(
        "day_start", F.timestamp_micros(F.expr(f"ts_us div {day_us}") * day_us)
    )
    dau = (
        ev.withWatermark("day_start", "1 day")
        .dropDuplicates(["user_id", "day_start"])
        .groupBy(F.window("day_start", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("dau"))
        .select(F.unix_micros(F.col("w.start")).alias("day_start_us"), "dau")
    )
    name = f"dau_t_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            dau.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        progresses = list(q.recentProgress)

    # the sentinel's own day may never close → it cannot appear; all
    # real days must (sentinel user would land on a far-future day)
    got = {r["day_start_us"]: r["dau"] for r in spark.table(name).collect()}
    raw_batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r["day_start_us"]: r["dau"]
        for r in raw_batch.withColumn("ts_us", events_ts_us(raw_batch))
        .select((F.expr(f"ts_us div {day_us}") * day_us).alias("day_start_us"), "user_id")
        .groupBy("day_start_us")
        .agg(F.count_distinct("user_id").alias("dau"))
        .collect()
    }
    assert got == want  # (a) exact match + (b) one row per day (dict keys)
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in progresses
        for op in (p.get("stateOperators") or [])
    )
    # dedup evicts one row per (user, day); the agg one per day
    assert removed >= sum(want.values()) + len(want), removed
    shutil.rmtree(tmp, ignore_errors=True)


def test_no_complete_mode_sinks_remain(spark, sf_dir):
    """With the r10 enrich migration (VERDICT r9 #7) the registry
    has ZERO complete-mode sinks, period: every streaming query is
    watermark-bound append/update, and the one catalog-bounded
    scoreboard (events_stream_enrich) runs in update mode with a
    last-update-wins reconstruction on the face."""
    import inspect

    from datatransformertools_spark import streaming

    src = inspect.getsource(streaming.events)
    assert src.count('.outputMode("complete")') == 0
    fn_src = inspect.getsource(streaming.events.events_stream_enrich)
    assert '.outputMode("update")' in fn_src
    assert "last-update-wins" in fn_src


def test_enrich_update_emits_only_touched_keys(spark, sf_dir):
    """The migrated enrich scoreboard must emit per micro-batch only
    the keys that batch TOUCHED (update mode), and the
    last-update-wins reconstruction must still land on the exact
    batch answer. Two-batch drain: the real file, then a small
    single-type file — batch 2 may re-emit at most that ONE type's
    row, not the whole |types| table (which is what the replaced
    complete-mode sink did every batch)."""
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from datatransformertools_spark.streaming.events import _read_raw, _state_partitions

    tmp = Path(tempfile.mkdtemp(prefix="dtt-stream-enrich-upd-"))
    src = tmp / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    t = pq.read_table(f"{sf_dir}/events.parquet")
    one_type = t.column("event_type")[0].as_py()
    pq.write_table(
        t.filter(pc.equal(t.column("event_type"), one_type)).slice(0, 20),
        src / "zz_second_batch.parquet",
    )

    static_stats = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.round(F.avg("value") + 1e-9, 4).alias("mean_value"))
    )
    raw = _read_raw(spark, str(src), maxFilesPerTrigger=1)
    enriched = raw.join(F.broadcast(static_stats), "event_type").withColumn(
        "above_mean", (F.col("value") > F.col("mean_value")).cast("long")
    )
    agg = enriched.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("above_mean").alias("n_above_mean"),
        F.max("mean_value").alias("mean_value"),
    )
    name = f"enrich_upd_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        progresses = list(q.recentProgress)
    data_batches = [p for p in progresses if p.get("numInputRows", 0) > 0]
    assert len(data_batches) >= 2, "expected the two files to drain as separate batches"
    assert data_batches[-1]["sink"]["numOutputRows"] <= 1

    # last-update-wins reconstruction == exact batch replay
    log = spark.table(name)
    got = {
        r.event_type: (r.n_events, r.n_above_mean)
        for r in log.groupBy("event_type")
        .agg(F.max(F.struct("n_events", "n_above_mean", "mean_value")).alias("s"))
        .select("event_type", "s.n_events", "s.n_above_mean")
        .collect()
    }
    want = {
        r.event_type: (r.n_events, r.n_above_mean)
        for r in spark.read.parquet(str(src))
        .join(F.broadcast(static_stats), "event_type")
        .withColumn("above_mean", (F.col("value") > F.col("mean_value")).cast("long"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("above_mean").alias("n_above_mean"))
        .collect()
    }
    assert got == want
    shutil.rmtree(tmp, ignore_errors=True)
