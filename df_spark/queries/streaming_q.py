"""Registry rows whose Spark side runs REAL Structured Streaming jobs
(``readStream`` → transform → memory sink, ``availableNow`` trigger,
driven to completion) so the streaming machinery gets the same
driver-visible oracle evidence as every batch operator. The stream
input is the bounded parquet table; on a cluster a Kafka source drops
in with the identical transform (reference has no streaming — this is
the Spark-native extension surface, see ``df_spark/streaming/``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..streaming import windows as SW
from . import register


@register(
    "stream_tumbling_hourly",
    sql="""
    WITH agg AS (
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS wb,
             event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(wb, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events, total_value
    FROM agg
    WHERE wb + INTERVAL '1 hour'
          <= (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL '2 hours' FROM events)
    """,
)
def stream_tumbling_hourly(spark, sf_dir):
    """Watermarked tumbling-window counts computed BY THE STREAMING
    ENGINE: a file-source stream of ``events``, 1-hour event-time
    windows with a 2-hour watermark, append output mode, driven to
    completion with ``availableNow`` into the memory sink.

    Append mode emits exactly the windows the final watermark closed —
    ``window_end <= max(ts) - 2h`` (verified empirically at sf0.001 and
    sf0.01; windows still open at end-of-stream are withheld, which is
    the documented streaming contract, not data loss) — so the oracle
    is the batch hourly aggregate with that same cutoff. The watermark
    tracks event-time at millisecond precision; the cutoff only gets
    ambiguous if max(ts) lands within 1 ms of an exact hour boundary,
    which ``test_stream_tumbling_emitted_set`` guards.

    Scale: state is bounded by (open windows x event types); the memory
    sink holds the closed-window AGGREGATES (≤ hours x types rows), not
    events. On a cluster the same query writes a parquet/Kafka sink via
    ``streaming.sinks.foreach_batch_parquet``."""
    stream = SW.read_events_stream(spark, sf_dir)
    # 2 state partitions: state is (open windows x event types) — tens
    # of keys — so store-commit overhead dominates any parallelism
    # (the r9 click_attribution finding, applied suite-wide in r10).
    # The no-data batch stays ON: append mode needs it to emit the
    # windows the final watermark closes.
    _, out = SW.run_stream_to_memory(
        SW.tumbling_counts(stream), output_mode="append", state_partitions=2)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "stream_decontaminate",
    sql=D.contamination_scores_sql("documents", "doc_id % 20 = 0", min_shared=25),
)
def stream_decontaminate(spark, sf_dir):
    """Benchmark decontamination where the TRAINING corpus arrives as a
    stream: documents stream → stream-static broadcast join against the
    static benchmark shingle-hash set → per-doc shared-hash counts
    (complete output mode: the aggregate is keyed on stream-side doc_id
    only, so its state is one counter per contaminated doc).

    Same contract as the batch ``decontaminate`` row (same oracle SQL)
    — registering the STREAMING twin's result gives ``streaming/`` a
    hash-checked driver row instead of pytest-only evidence. The
    benchmark side is a bounded static frame rebuilt per restart, the
    production refresh model for eval suites."""
    from ..sources.tables import load_sdf

    docs = load_sdf(spark, sf_dir, "documents")
    bench = docs.filter(F.expr("doc_id % 20 = 0"))
    stream = SW.read_documents_stream(spark, sf_dir).filter(
        F.expr("NOT (doc_id % 20 = 0)"))
    # 2 state partitions: the stateful aggregate holds one counter per
    # contaminated doc (~5k at sf0.1) — per-store commit overhead beats
    # any parallelism 8 partitions would buy; the shingle/hash probe
    # work is spread by the stateless repartition inside
    # decontaminate_stream, not by the state partitioning. The probe
    # regime (InSet vs broadcast join) is decided inside
    # decontaminate_stream, which returns the matching output mode.
    decon, mode = SW.decontaminate_stream(stream, bench, min_shared=25)
    _, out = SW.run_stream_to_memory(
        decon, output_mode=mode, state_partitions=2,
    )
    return out


@register(
    "stream_click_attribution",
    sql="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS cts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS pts,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, click_id, purchase_id,
           epoch_us(cts) AS click_us, epoch_us(pts) AS purchase_us,
           purchase_value
    FROM c JOIN p ON c.user_id = p.user_id
      AND pts >= cts AND pts <= cts + INTERVAL '30 minutes'
    """,
)
def stream_click_attribution(spark, sf_dir):
    """STREAM-STREAM interval join run by the streaming engine: click
    and purchase streams (two filters of the events file stream), each
    watermarked 2h, joined on user within a [0, 30 min] event-time
    horizon — the attribution join of an event pipeline, with state
    evicted as both watermarks advance.

    INNER stream-stream joins emit every match as it is found (only
    outer joins wait on the watermark to declare non-matches), so over
    a bounded availableNow stream the emitted set equals the batch
    interval join EXACTLY — verified at sf0.001 and sf0.01 and pinned
    by ``test_stream_stream_interval_join_matches_batch`` — which makes
    the oracle a plain SQL interval join with no emission-cutoff
    clause. State at 100 TB: O(events inside the watermark x horizon
    window) per user partition, one shuffle per side on user_id."""
    stream = SW.read_events_stream(spark, sf_dir)
    joined = SW.interval_join_streams(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    # 2 state partitions: a stream-stream join keeps FOUR state stores
    # per partition, and per-store commit overhead — not the 200k-row
    # probe — dominates this bounded drain (8 partitions = 32 store
    # commits per batch; the driver-host wall tracked store count, not
    # data). The no-data batch is skipped: inner joins emit matches on
    # arrival, so the trailing empty batch only paid a second full
    # round of state commits. On a real cluster sizing state
    # partitions to stateful-key cardinality is the same deliberate
    # call (frozen by the first checkpoint).
    _, out = SW.run_stream_to_memory(joined, output_mode="append",
                                     state_partitions=2,
                                     no_data_batch=False)
    return out.select(
        "user_id", "click_id", "purchase_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "purchase_value",
    )


@register(
    "stream_dedup",
    sql="SELECT event_id FROM events",
)
def stream_dedup(spark, sf_dir):
    """Streaming exact-dedup via ``dropDuplicatesWithinWatermark``: the
    events stream unioned with ITSELF (every row arrives twice in the
    batch) must come out with each event_id exactly once — the oracle
    is simply the unique id set. State is evicted once the watermark
    passes an id's event time, so memory is bounded by the horizon,
    not the stream; the batch twin is ``dedup_exact``. At 100 TB this
    is the Kafka at-least-once ingestion dedup: one shuffle on the id,
    state = ids inside the watermark window."""
    stream = SW.read_events_stream(spark, sf_dir)
    doubled = stream.unionByName(stream)
    # 2 state partitions: ~100k ids in state at sf0.1 — well inside a
    # single store's comfort zone, and commit count beats parallelism
    # on a bounded drain. On a real cluster size this to id-cardinality
    # x horizon (the partitioning is frozen by the first checkpoint).
    _, out = SW.run_stream_to_memory(
        SW.dedup_stream(doubled, keys=["event_id"], watermark="2 hours"),
        output_mode="append", state_partitions=2)
    return out.select("event_id")


@register(
    "stream_user_profiles",
    sql="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           epoch_us(max(CAST(ts AS TIMESTAMP))) AS last_seen_us
    FROM events GROUP BY user_id
    """,
)
def stream_user_profiles(spark, sf_dir):
    """CUSTOM STATEFUL streaming operator (``applyInPandasWithState``,
    ``streaming/stateful.py``): per-user running profiles whose
    accumulators live in the state store across micro-batches — the
    (b)-tier escape hatch for semantics built-in windowed aggregates
    can't express. Driven to completion over the bounded stream, the
    final profile per user equals the batch aggregate, which is the
    oracle. The hashed projection keeps the exactly-reproducible
    columns (count, last-seen); the running double sum stays in the
    operator's output and is pinned by ``test_stateful_user_profiles``
    (float summation order across arrival batches is not part of the
    cross-engine contract). State at 100 TB: one fixed-width row per
    active user, update-mode emission."""
    from ..streaming.stateful import user_profiles_stream

    from pyspark.sql import functions as F2

    stream = SW.read_events_stream(spark, sf_dir)
    # 2 state partitions (the click_attribution trim, r9): state is
    # one fixed-width row per user (~1.5k at sf0.1) — per-store commit
    # overhead beats parallelism; the Arrow UDF work itself is tiny.
    # The no-data batch stays ON: applyInPandasWithState uses it to
    # fire timeouts (NoTimeout today, but the contract is the
    # operator's, not this call site's).
    _, out = SW.run_stream_to_memory(
        user_profiles_stream(stream), output_mode="update",
        state_partitions=2)
    # update mode appends one row per (user, batch); the accumulators
    # are monotone, so max = the final profile — robust to the file
    # source splitting into multiple micro-batches
    return out.groupBy("user_id").agg(
        F2.max("n_events").alias("n_events"),
        F2.max("last_seen_us").alias("last_seen_us"),
    )


@register(
    "stream_sessions",
    sql="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), o AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM e
    ), brk AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ), grp AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS g
      FROM brk
    ), sess AS (
      SELECT user_id,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL '30 minutes' AS session_end,
             COUNT(*) AS n_events
      FROM grp GROUP BY user_id, g
    )
    SELECT user_id,
           epoch_us(session_start) AS start_us,
           epoch_us(session_end) AS end_us,
           n_events
    FROM sess
    WHERE session_end
          <= (SELECT date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP)))
                     - INTERVAL '2 hours' FROM events)
    """,
)
def stream_sessions(spark, sf_dir):
    """Native streaming SESSION windows (gap-merged state in the state
    store), driven to completion in append mode: per-user sessions
    with a 30-minute inactivity gap and a 2-hour watermark.

    Spark's session_window spans [first event, last event + gap) and
    merges an event only while it lands strictly inside the open
    window, so the oracle's gaps-and-islands twin breaks on
    ``ts - prev >= gap`` and reports end = last + gap. Append mode
    emits exactly the sessions the final watermark closed —
    ``session_end <= floor_ms(max(ts)) - 2h``: Spark computes the
    watermark from MILLISECOND event-time stats while the data carries
    microsecond timestamps, so the oracle (and the pytest twin) floors
    max(ts) to ms before subtracting the delay — session ends are
    arbitrary microsecond values and an unfloored cutoff would
    nondeterministically disagree inside the sub-ms gap.
    (``stream_tumbling_hourly`` needs no floor: its window ends are
    hour-aligned.) (The batch ``events_sessions`` row keeps its own
    break-on-``>`` contract; this row's contract is the streaming
    engine's.) State at 100 TB: open sessions per user inside the
    watermark horizon, evicted on close."""
    stream = SW.read_events_stream(spark, sf_dir)
    # 2 state partitions: open sessions per user (~1.5k users at
    # sf0.1) — the suite-wide store-commit trim; no-data batch stays
    # ON (append mode emits watermark-closed sessions there).
    _, out = SW.run_stream_to_memory(
        SW.session_windows(stream, gap="30 minutes"), output_mode="append",
        state_partitions=2)
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "n_events",
    )


@register(
    "stream_left_outer",
    sql="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS cts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS pts,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
      SELECT LEAST(
               date_trunc('milliseconds', (SELECT max(cts) FROM c)),
               date_trunc('milliseconds', (SELECT max(pts) FROM p))
             ) - INTERVAL '2 hours' AS w
    )
    SELECT c.user_id, c.click_id, p.purchase_id,
           epoch_us(c.cts) AS click_us, epoch_us(p.pts) AS purchase_us,
           p.purchase_value
    FROM c JOIN p ON c.user_id = p.user_id
      AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL '30 minutes'
    UNION ALL
    SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT),
           epoch_us(c.cts), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
    FROM c, wm
    WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = c.user_id
          AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL '30 minutes')
      AND c.cts + INTERVAL '30 minutes' <= wm.w
    """,
)
def stream_left_outer(spark, sf_dir):
    """LEFT OUTER stream-stream interval join — the semantics the
    inner-join row cannot show: clicks with NO purchase in the 30-min
    horizon surface as null-augmented rows once the engine can PROVE
    no match is coming (state eviction by watermark), the
    "unconverted clicks" ledger of an attribution pipeline.

    Emission contract (probed empirically at sf0.001 and sf0.01, both
    exact): matches emit on arrival (inner semantics); an unmatched
    click's null row emits when ``click_ts + horizon <= W`` where the
    global watermark ``W = least(floor_ms(max click ts), floor_ms(max
    purchase ts)) - 2h`` — the engine takes the MIN across the two
    per-side watermark operators (each side's event-time stats are
    computed after its filter), NOT the overall event max; r9's
    ms-floored-watermark recipe applies per side. The no-data batch
    must stay ON: it advances the final watermark and is the batch
    that performs the eviction emitting the null rows (the
    ``no_data_batch=False`` knob is documented inner-join-only).

    State at 100 TB: same bound as the inner join — events inside
    watermark x horizon per user partition — plus the unmatched-click
    buffer the outer semantics require anyway."""
    stream = SW.read_events_stream(spark, sf_dir)
    joined = SW.interval_join_streams_outer(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    _, out = SW.run_stream_to_memory(joined, output_mode="append",
                                     state_partitions=2)
    return out.select(
        "user_id", "click_id", "purchase_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "purchase_value",
    )


_QUOTA_PER_DAY = 7


@register(
    "stream_quota_alerts",
    sql=f"""
    WITH agg AS (
      SELECT time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS wb,
             user_id, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(wb, '%Y-%m-%d %H:%M:%S') AS window_start,
           user_id, n_events
    FROM agg
    WHERE n_events >= {_QUOTA_PER_DAY}
      AND wb + INTERVAL '1 day'
          <= (SELECT date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP)))
                     - INTERVAL '2 hours' FROM events)
    """,
)
def stream_quota_alerts(spark, sf_dir):
    """Streaming quota/rate-limit alerting: per-user event counts in
    1-day tumbling event-time windows, emitting only users that breach
    the daily quota — the abuse/billing alert every event pipeline
    runs beside ingestion. Append mode + 2-hour watermark: an alert
    fires exactly once, when its window closes (watermark-emitted),
    never re-fires on late updates inside the watermark, and the
    still-open day is withheld — that is the alerting contract (no
    flapping), and the oracle encodes the same cutoff
    (``window_end <= floor_ms(max ts) - 2h``; day-aligned ends make
    the ms floor belt-and-braces).

    Scale shape: state is one counter per (open day x active user) —
    watermark-evicted; the quota filter rides AFTER the stateful
    aggregate so partial map-side combine still applies. 2 state
    partitions per the suite-wide store-commit trim."""
    stream = SW.read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= _QUOTA_PER_DAY)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "user_id", "n_events",
        )
    )
    _, out = SW.run_stream_to_memory(agg, output_mode="append",
                                     state_partitions=2)
    return out


@register(
    "stream_timeout_sessions",
    sql="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), o AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM e
    ), brk AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ), grp AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS g
      FROM brk
    ), sess AS (
      SELECT user_id, g,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL '30 minutes' AS session_end,
             COUNT(*) AS n_events
      FROM grp GROUP BY user_id, g
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY g DESC)
               AS rn
      FROM sess
    )
    SELECT user_id,
           epoch_us(session_start) AS start_us,
           epoch_us(session_end) AS end_us,
           n_events
    FROM ranked
    WHERE rn > 1
       OR date_trunc('milliseconds', session_end)
          <= (SELECT date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP)))
                     - INTERVAL '2 hours' FROM events)
    """,
)
def stream_timeout_sessions(spark, sf_dir):
    """CUSTOM stateful sessionizer via ``applyInPandasWithState`` with
    EVENT-TIME TIMEOUT eviction (``streaming/stateful.py``) — the
    timeout path no other operator exercises: sessions closed by a
    later in-batch event emit immediately; each user's trailing OPEN
    session parks in the state store with
    ``setTimeoutTimestamp(last + gap)`` and is flushed when the no-data
    batch advances the watermark past it (which is why the no-data
    batch must stay ON for applyInPandasWithState — the knob doc's
    caveat, here load-bearing).

    Emission contract (probed exact at sf0.001 and sf0.01): every
    non-final session per user, plus final sessions with
    ``floor_ms(last + gap) <= floor_ms(max ts) - 2h``. Contrast with
    ``stream_sessions`` (native session_window, append mode): there
    the WATERMARK gates every emission, so recent closed sessions are
    withheld; the custom operator emits in-batch-closed sessions
    regardless — more production-like for a sessionizer feeding
    downstream joins, and a genuinely different contract, not a
    re-skin. State at 100 TB: one open-session row per active user,
    evicted by timeout."""
    from ..streaming.stateful import timeout_sessions_stream

    stream = SW.read_events_stream(spark, sf_dir)
    _, out = SW.run_stream_to_memory(
        timeout_sessions_stream(stream), output_mode="append",
        state_partitions=2)
    return out.select("user_id", "start_us", "end_us", "n_events")


@register(
    "stream_sliding_hourly",
    sql="""
    WITH ex AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
               - u.k * INTERVAL '15 minutes' AS wb
      FROM events, UNNEST(generate_series(0, 3)) AS u(k)
    ),
    agg AS (
      SELECT wb, event_type, COUNT(*) AS n_events FROM ex GROUP BY 1, 2
    )
    SELECT strftime(wb, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events
    FROM agg
    WHERE wb + INTERVAL '1 hour'
          <= (SELECT date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP)))
                     - INTERVAL '2 hours' FROM events)
    """,
)
def stream_sliding_hourly(spark, sf_dir):
    """SLIDING event-time windows in the streaming engine (1-hour
    window, 15-minute slide): each event lands in 4 overlapping
    windows, so the stateful aggregate holds 4x the open-window keys
    of the tumbling row — the monitoring shape (rates over a trailing
    hour, refreshed every slide) that tumbling windows cannot express.
    Append mode + 2h watermark: a window emits once, when it closes.

    Oracle: each event expands to its 4 slide-aligned window starts
    (``time_bucket(15min, ts) - k*15min``, k=0..3 — exactly the
    engine's window assignment), aggregated with the same
    watermark-closed cutoff as the tumbling row (15-minute-aligned
    ends; ms floor belt-and-braces). The batch twin ``events_sliding``
    keeps its own contract; this row's contract is the engine's
    emission set.

    State at 100 TB: (open windows x types) keys, watermark-evicted;
    4x key inflation is the price of overlap and is bounded by the
    window/slide ratio, not the stream."""
    stream = SW.read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type", "n_events",
        )
    )
    _, out = SW.run_stream_to_memory(agg, output_mode="append",
                                     state_partitions=2)
    return out


@register(
    "stream_topk_trending",
    sql="""
    WITH agg AS (
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS wb,
             user_id, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT wb, user_id, n_events,
             ROW_NUMBER() OVER (PARTITION BY wb
                                ORDER BY n_events DESC, user_id) AS rank
      FROM agg
    )
    SELECT strftime(wb, '%Y-%m-%d %H:%M:%S') AS window_start,
           user_id, n_events, rank
    FROM r WHERE rank <= 3
    """,
)
def stream_topk_trending(spark, sf_dir):
    """Trending top-k over a stream: hourly per-user activity counts
    maintained by the streaming engine in COMPLETE output mode (the
    leaderboard pattern — every trigger rewrites the full standings),
    with the top-3 ranking applied to the sink table. Complete mode
    needs no watermark and withholds nothing, so the oracle is the
    plain batch aggregate + rank — a different emission contract than
    stream_tumbling_hourly's append-mode closed-window set, and the
    reason both live in the registry.

    The RANK runs batch-side on the sink, not in the stream: Spark
    disallows row_number after a streaming aggregate in complete mode,
    and the production pattern agrees — the serving layer (or a
    foreachBatch hook) ranks the tiny standings table, while the
    stream maintains only the additive counts. Ties break by user_id,
    so the emitted set is deterministic.

    Scale: state = (windows x active users) counters — additive,
    fixed-width; complete mode's per-trigger rewrite is proportional
    to the standings size, not the stream. On a real cluster the rank
    rides in foreachBatch against each rewrite."""
    stream = SW.read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events")
    )
    # 2 state partitions: windows x users counters, store-commit bound
    # (the r9 click_attribution finding, applied suite-wide in r10)
    _, out = SW.run_stream_to_memory(
        agg, output_mode="complete", state_partitions=2)
    from pyspark.sql import Window as W

    rk = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc())
    return (
        out.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= 3)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "user_id", "n_events", "rank",
        )
    )
