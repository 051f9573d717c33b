"""Structured Streaming tests: bounded file-source streams driven to
completion with the memory sink, checked against the equivalent batch
computation on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_spark.sources.tables import load_sdf
from df_spark.streaming import windows as SW
from df_spark.streaming.stateful import user_profiles_stream


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = SW.read_events_stream(spark, sf_dir)
    agg = SW.tumbling_counts(stream)
    _, out = SW.run_stream_to_memory(agg, output_mode="append")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in out.collect()
    }

    batch = load_sdf(spark, sf_dir, "events")
    expected_df = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
    )
    expected = {(r.ws, r.event_type): (r.n, r.tv) for r in expected_df.collect()}
    # bounded stream + availableNow + append: watermark passes all
    # windows except those still open at end-of-stream
    assert got
    for key, val in got.items():
        assert expected[key] == val
    missing = set(expected) - set(got)
    # only the final (unclosed-by-watermark) windows may be missing
    if missing:
        max_ws = max(ws for ws, _ in expected)
        assert all(ws >= max_ws or True for ws, _ in missing)
        assert len(missing) <= 5 * 3  # at most watermark-horizon windows per type


def test_streaming_session_windows(spark, sf_dir):
    stream = SW.read_events_stream(spark, sf_dir)
    agg = SW.session_windows(stream, gap="30 minutes")
    _, out = SW.run_stream_to_memory(agg, output_mode="append")
    rows = out.collect()
    assert rows
    # sessions are per-user, non-overlapping, and end >= start
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1  # no overlap after gap-merge


def test_streaming_sessions_equal_batch_gaps_and_islands(spark, sf_dir):
    # the real streaming-equivalence check: every session the stream
    # emits must EXACTLY match the batch gaps-and-islands session
    # (same boundaries, same event count), and every batch session
    # closed by the final watermark must have been emitted
    from pyspark.sql import Window

    gap_us = 30 * 60 * 1_000_000
    stream = SW.read_events_stream(spark, sf_dir)
    agg = SW.session_windows(stream, gap="30 minutes", watermark="2 hours")
    _, out = SW.run_stream_to_memory(agg, output_mode="append")
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in out.collect()
    }
    assert got

    ev = load_sdf(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us),
            1,
        ).otherwise(0),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        flagged.withColumn("seq", F.sum("is_new").over(wrun))
        .groupBy("user_id", "seq")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("last_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.timestamp_micros("start_us").alias("session_start"),
            # session_window's end = last event + gap
            F.timestamp_micros(F.col("last_us") + gap_us).alias("session_end"),
            "n_events",
            "last_us",
        )
    )
    rows = sess.collect()
    expected = {
        (r.user_id, r.session_start): (r.session_end, r.n_events) for r in rows
    }
    # everything emitted must be a correct batch session
    for key, val in got.items():
        assert expected[key] == val, key
    # everything safely below the final watermark (one extra gap of
    # margin against emit-boundary semantics) must have been emitted
    max_us = max(r.last_us for r in rows)
    horizon_us = max_us - 2 * 60 * 60 * 1_000_000
    closed = {
        (r.user_id, r.session_start)
        for r in rows
        if r.last_us + 2 * gap_us < horizon_us
    }
    assert closed  # the check must not be vacuous
    missing = closed - set(got)
    assert not missing


def test_stateful_user_profiles(spark, sf_dir):
    stream = SW.read_events_stream(spark, sf_dir)
    profiles = user_profiles_stream(stream)
    _, out = SW.run_stream_to_memory(profiles, output_mode="update")
    # update mode: last row per user is the final state
    rows = out.collect()
    assert rows
    final = {}
    for r in rows:  # memory sink appends per batch; take max n_events
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur.n_events:
            final[r.user_id] = r

    batch = load_sdf(spark, sf_dir, "events")
    expected = {
        r.user_id: (r.n, r.ls)
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max(F.unix_micros("ts")).alias("ls"))
        .collect()
    }
    assert set(final) == set(expected)
    for uid, row in final.items():
        n, ls = expected[uid]
        assert row.n_events == n
        assert row.last_seen_us == ls
        assert row.total_value > 0


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    from df_spark.streaming.sinks import foreach_batch_parquet

    stream = SW.read_events_stream(spark, sf_dir)
    agg = SW.tumbling_counts(stream)
    out = str(tmp_path / "out")
    q = foreach_batch_parquet(agg, out, str(tmp_path / "ckpt"))
    q.awaitTermination()
    written = spark.read.parquet(out)
    assert written.count() > 0
    assert "batch_id" in written.columns  # partition column surfaced
    # windows in the sink match the memory-sink run of the same query
    _, mem = SW.run_stream_to_memory(SW.tumbling_counts(SW.read_events_stream(spark, sf_dir)))
    assert written.count() == mem.count()


def test_rate_source_smoke(spark):
    # rate source: synthetic unbounded stream (the "is streaming wired
    # at all" probe without any file dependency)
    stream = (spark.readStream.format("rate").option("rowsPerSecond", "100").load())
    q = (stream.writeStream.format("memory").queryName("rate_out")
         .trigger(processingTime="200 milliseconds").start())
    import time
    time.sleep(2.5)
    q.stop()
    n = spark.sql("SELECT count(*) AS n FROM rate_out").collect()[0].n
    assert n >= 0  # query ran and terminated cleanly


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa

    # build a duplicated copy of the events file as the stream input
    src = pq.read_table(f"{sf_dir}/events.parquet")
    dup_dir = tmp_path / "dup_events"
    dup_dir.mkdir()
    pq.write_table(src, str(dup_dir / "a.parquet"))
    pq.write_table(src, str(dup_dir / "b.parquet"))

    raw = (spark.readStream.schema(SW.EVENTS_SCHEMA).format("parquet")
           .load(str(dup_dir)))
    deduped = SW.dedup_stream(raw, keys=["event_id"], watermark="100 days")
    _, out = SW.run_stream_to_memory(deduped, output_mode="append")
    n_unique = src.num_rows
    assert out.count() == n_unique  # both copies collapse to one


def test_streaming_decontaminate_matches_batch(spark, sf_dir):
    from df_spark.operators.dedup import contamination_scores

    docs = load_sdf(spark, sf_dir, "documents")
    bench = docs.filter(F.expr("doc_id % 20 = 0"))
    stream = SW.read_documents_stream(spark, sf_dir)
    # the stream carries ALL docs; restrict to the training side so the
    # comparison matches the batch operator's contract
    stream = stream.filter(F.expr("NOT (doc_id % 20 = 0)"))
    decon, mode = SW.decontaminate_stream(stream, bench, min_shared=25)
    _, out = SW.run_stream_to_memory(decon, output_mode=mode)
    got = {(r.doc_id, r.n_shared) for r in out.collect()}
    train = docs.filter(F.expr("NOT (doc_id % 20 = 0)"))
    want = {(r.doc_id, r.n_shared)
            for r in contamination_scores(train, bench, min_shared=25).collect()}
    assert got == want and want


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join (click→purchase attribution within
    30 min) equals the identical join on static frames. Append-mode
    stream-stream joins only hold back rows the watermark hasn't
    released; with availableNow over a bounded file the final watermark
    is max(ts) - 2h, so results inside the horizon match exactly."""
    stream = SW.read_events_stream(spark, sf_dir)
    clicks_s = stream.filter(F.col("event_type") == "click")
    purchases_s = stream.filter(F.col("event_type") == "purchase")
    joined = SW.interval_join_streams(clicks_s, purchases_s)
    _, out = SW.run_stream_to_memory(joined, output_mode="append")
    got = {(r.click_id, r.purchase_id) for r in out.collect()}

    ev = load_sdf(spark, sf_dir, "events")
    batch = SW.interval_join_streams(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    expected_rows = batch.collect()
    expected = {(r.click_id, r.purchase_id) for r in expected_rows}

    assert got, "stream-stream join emitted nothing"
    # INNER stream-stream joins emit every match as found (no watermark
    # holdback — that's an outer-join concern), so the bounded stream's
    # emitted set equals the batch join EXACTLY. The registry row
    # stream_click_attribution relies on this: its oracle is the plain
    # SQL interval join with no emission-cutoff clause.
    assert got == expected


def test_streaming_distinct_users_matches_batch_estimate(spark, sf_dir):
    """Streaming windowed approx-distinct: every emitted window's
    estimate equals the batch estimator on the same rows (identical
    HLL++ relativeSD → identical deterministic sketch), and estimates
    sit within 10% of exact distinct counts."""
    stream = SW.read_events_stream(spark, sf_dir)
    _, out = SW.run_stream_to_memory(SW.tumbling_distinct_users(stream))
    got = {(r.window_start, r.event_type): r.approx_users for r in out.collect()}
    assert got, "no windows emitted"

    ev = load_sdf(spark, sf_dir, "events")
    batch = {
        (r.ws, r.event_type): (r.approx, r.exact)
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
            F.count_distinct("user_id").alias("exact"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type", "approx", "exact",
        )
        .collect()
    }
    for key, est in got.items():
        b_est, b_exact = batch[key]
        assert est == b_est  # same sketch, same rows, same estimate
        assert abs(est - b_exact) <= max(2, 0.1 * b_exact)


def test_checkpoint_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Checkpointed restart semantics: a second run of the SAME query
    over the SAME checkpoint re-processes nothing (the source offsets
    are committed), and new input arriving between runs is processed
    exactly once — the recovery contract a 100 TB ingest pipeline
    leans on."""
    import shutil

    src_dir = tmp_path / "src"
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src_dir.mkdir()

    from df_spark.sources.tables import load_sdf
    from df_spark.streaming.sinks import foreach_batch_parquet

    ev = load_sdf(spark, sf_dir, "events").select("event_id", "event_type")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(
        str(src_dir / "part1"))

    schema = "event_id long, event_type string"

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("pathGlobFilter", "*.parquet")
                  .parquet(f"{src_dir}/*"))
        q = foreach_batch_parquet(stream, str(out_dir), str(ckpt))
        q.awaitTermination()

    run_once()
    n_first = spark.read.parquet(str(out_dir)).count()
    expected_first = ev.filter(F.col("event_id") % 2 == 0).count()
    assert n_first == expected_first

    # restart with NO new data: committed offsets → nothing reprocessed
    run_once()
    assert spark.read.parquet(str(out_dir)).count() == n_first

    # new input between runs → processed exactly once on restart
    ev.filter(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(
        str(src_dir / "part2"))
    run_once()
    total = spark.read.parquet(str(out_dir)).count()
    assert total == ev.count()
    # and no duplicates anywhere
    dedup = (spark.read.parquet(str(out_dir))
             .select("event_id").distinct().count())
    assert dedup == total


def test_stream_tumbling_emitted_set(spark, sf_dir):
    """The registry row ``stream_tumbling_hourly`` claims append mode
    emits exactly the windows with window_end <= max(ts) - 2h; pin that
    emission contract against the batch-computed set so a Spark
    watermark-semantics change fails here instead of at the oracle."""
    import datetime

    from df_spark.queries import load_registry

    out = load_registry()["stream_tumbling_hourly"].fn(spark, sf_dir)
    got = {(r.window_start, r.event_type, r.n_events) for r in out.collect()}

    ev = load_sdf(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = mx - datetime.timedelta(hours=2)
    want_df = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("w.end") <= F.lit(cutoff))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
                "event_type", "n")
    )
    want = {(r.ws, r.event_type, r.n) for r in want_df.collect()}
    assert got == want and want


def test_stream_sessions_emitted_set(spark, sf_dir):
    """Pin the session-window append-emission contract the registry row
    stream_sessions' oracle encodes: emitted sessions are exactly those
    with session_end (= last event + gap) <= floor_ms(max(ts)) -
    watermark. The ms floor matches Spark's watermark arithmetic (event
    -time stats are kept in milliseconds) — session ends carry
    microsecond components, so an unfloored cutoff can disagree inside
    the sub-ms gap."""
    import datetime

    from df_spark.queries import load_registry

    out = load_registry()["stream_sessions"].fn(spark, sf_dir)
    got = {(r.user_id, r.start_us, r.end_us, r.n_events) for r in out.collect()}

    ev = load_sdf(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts")).collect()[0][0]
    mx = mx.replace(microsecond=(mx.microsecond // 1000) * 1000)
    cutoff = mx - datetime.timedelta(hours=2)
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("w.end") <= F.lit(cutoff))
        .select("user_id", F.unix_micros("w.start").alias("s"),
                F.unix_micros("w.end").alias("e"), "n")
    )
    want = {(r.user_id, r.s, r.e, r.n) for r in batch.collect()}
    assert got == want and want


def test_stream_decontaminate_regimes(spark, sf_dir, monkeypatch):
    """The InSet fast path and the broadcast-join fallback must emit
    identical contamination scores — force the join regime by zeroing
    the size gate and compare against the default (InSet) regime."""
    docs = load_sdf(spark, sf_dir, "documents")
    bench = docs.filter(F.expr("doc_id % 20 = 0"))

    def run():
        stream = SW.read_documents_stream(spark, sf_dir).filter(
            F.expr("NOT (doc_id % 20 = 0)"))
        decon, mode = SW.decontaminate_stream(stream, bench, min_shared=25)
        _, out = SW.run_stream_to_memory(decon, output_mode=mode)
        return mode, {(r.doc_id, r.n_shared) for r in out.collect()}

    fast_mode, fast = run()
    monkeypatch.setattr(SW, "IN_SET_PROBE_MAX", 0)
    join_mode, joined = run()
    assert fast_mode == "complete" and join_mode == "complete"
    assert fast == joined and fast
