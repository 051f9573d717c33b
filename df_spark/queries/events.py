"""Event-time window queries over ``events`` (batch twins of the
streaming operators in ``df_spark.streaming``): tumbling and sliding
windows, gap-based sessionization. Timestamps are emitted as epoch
microseconds / formatted strings so oracle comparison is precision-safe
(events.ts is nanosecond parquet, truncated to µs identically on both
engines — see ``sources.tables``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.tables import load_sdf
from . import register

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


@register(
    "events_tumbling",
    sql="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling(spark, sf_dir):
    # F.window is the same operator Structured Streaming uses — batch
    # here, identical code path with readStream + watermark in
    # df_spark.streaming.windows
    ev = load_sdf(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sliding",
    sql="""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                      - TO_MICROSECONDS(CAST(k AS BIGINT) * 15 * 60 * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
    GROUP BY 1
    """,
)
def events_sliding(spark, sf_dir):
    # 1-hour window sliding every 15 minutes: each event lands in 4
    # overlapping windows (Spark expands this internally; the oracle
    # expands it with an explicit offset cross join)
    ev = load_sdf(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sessions",
    sql=f"""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
               (PARTITION BY user_id
                ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_us
      FROM events
    ), brk AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN prev_us IS NULL OR ts_us - prev_us > {_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ), sess AS (
      SELECT user_id, event_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM brk
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def events_sessions(spark, sf_dir):
    # gap-based sessionization: lag → new-session flag → cumulative sum
    # (the classic gaps-and-islands plan; one shuffle on user_id, both
    # windows reuse the same partitioning)
    ev = load_sdf(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > _GAP_US),
            1,
        ).otherwise(0),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn("session_seq", F.sum("is_new").over(wrun))
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@register(
    "events_type_stats",
    sql="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def events_type_stats(spark, sf_dir):
    ev = load_sdf(spark, sf_dir, "events")
    dec_sum = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        dec_sum.alias("total_value"),
        (dec_sum / F.count(F.lit(1))).alias("avg_value"),
    )


@register(
    "events_funnel",
    sql="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def events_funnel(spark, sf_dir):
    # ordered funnel (view -> click -> purchase): each stage keeps the
    # earliest qualifying event AFTER the previous stage's timestamp.
    # Decorrelated into three per-user min-aggregates chained by joins —
    # every stage is one shuffle on user_id (uniform key), and the
    # stage frames shrink monotonically; at 100 TB the same plan holds
    # with the events scan pruned to the three types
    ev = load_sdf(spark, sf_dir, "events")

    def stage(etype, prev, tcol, prev_t):
        e = ev.filter(F.col("event_type") == etype)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(tcol))
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    v = stage("view", None, "t1", None)
    c = stage("click", v, "t2", "t1")
    p = stage("purchase", c, "t3", "t2")
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@register(
    "events_rolling",
    sql="""
    WITH hourly AS (
      SELECT event_type,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT) AS hour_id,
             COUNT(*) AS cnt
      FROM events
      GROUP BY 1, 2
    )
    SELECT event_type, hour_id, cnt,
           CAST(SUM(cnt) OVER w AS BIGINT) AS prev6_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS prev6_buckets,
           COALESCE(cnt * COUNT(*) OVER w > 2 * SUM(cnt) OVER w, FALSE) AS spike
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
                 RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING)
    """,
)
def events_rolling(spark, sf_dir):
    # trailing-window rate monitoring: hourly per-type counts, the sum
    # over the 6 preceding hour-buckets (RANGE frame on the integer
    # hour id — gaps stay gaps), and an integer-exact spike flag
    # (cnt > 2x trailing average, cross-multiplied so no division
    # enters the comparison). Window partitions by event_type: parallel
    # across types, no global sort; the hourly pre-aggregate keeps the
    # window input at buckets, not raw events.
    from pyspark.sql import Window as W

    ev = load_sdf(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hour_id"),
        )
        .groupBy("event_type", "hour_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        W.partitionBy("event_type").orderBy("hour_id").rangeBetween(-6, -1)
    )
    prev_sum = F.sum("cnt").over(w)
    prev_n = F.count(F.lit(1)).over(w)
    spike = F.coalesce(
        F.col("cnt") * prev_n > 2 * prev_sum, F.lit(False)
    )
    return hourly.select(
        "event_type", "hour_id", "cnt",
        prev_sum.cast("long").alias("prev6_sum"),
        prev_n.cast("long").alias("prev6_buckets"),
        spike.alias("spike"),
    )


@register(
    "events_gapfill",
    sql="""
    WITH b AS (
      SELECT CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 3600000000)
                  AS BIGINT) AS hour_bucket,
             event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_value
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT MIN(hour_bucket) AS lo, MAX(hour_bucket) AS hi FROM b),
    hours AS (SELECT unnest(range(lo, hi + 1)) AS hour_bucket FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT h.hour_bucket, t.event_type,
           COALESCE(b.n, 0) AS n_events,
           LAST_VALUE(b.avg_value IGNORE NULLS)
             OVER (PARTITION BY t.event_type ORDER BY h.hour_bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS carried_avg
    FROM hours h CROSS JOIN types t
    LEFT JOIN b ON b.hour_bucket = h.hour_bucket AND b.event_type = t.event_type
    """,
)
def events_gapfill(spark, sf_dir):
    """Time-series gap filling + forward fill: the dense hour × type
    grid is generated IN-PLAN (explode over a sequence between the
    1-row min/max bounds — no driver collect, no Python range), empty
    buckets get zero counts, and the last observed per-type average is
    carried forward with last_value(ignorenulls).

    Scale shape: the grid is |hours| × |types| — tiny relative to the
    events it summarizes; the per-bucket agg is the only corpus-sized
    shuffle. The forward-fill window partitions by type, so state per
    task is one running value — the same shape as the streaming
    carry-forward in the as-of join (operators/joins.py).

    Determinism: bucket math is integer epoch-µs; per-bucket averages
    divide a DECIMAL-exact sum once.
    """
    ev = load_sdf(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
    )
    hours = (
        b.agg(F.min("hour_bucket").alias("lo"), F.max("hour_bucket").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("hour_bucket"))
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(types)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["hour_bucket", "event_type"], "left")
        .select(
            "hour_bucket",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("carried_avg"),
        )
    )


@register(
    "events_anomaly",
    sql="""
    WITH hc AS (
      SELECT event_type,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             hour(CAST(ts AS TIMESTAMP)) AS hh,
             COUNT(*)::BIGINT AS n_events
      FROM events GROUP BY 1, 2, 3
    ),
    st AS (
      SELECT event_type, COUNT(*)::BIGINT AS n_buckets,
             SUM(n_events)::BIGINT AS s, SUM(n_events * n_events)::BIGINT AS q
      FROM hc GROUP BY 1
    )
    SELECT event_type, day, hh, n_events, n_buckets,
           s AS type_total
    FROM hc JOIN st USING (event_type)
    WHERE n_events * n_buckets - s > 0
      AND (n_events * n_buckets - s) * (n_events * n_buckets - s)
          > 9 * (n_buckets * q - s * s)
    """,
)
def events_anomaly(spark, sf_dir):
    """Volume-spike detection: hourly event counts per type, flagging
    buckets more than 3 population-sigmas above that type's mean rate —
    the monitoring query an ingestion pipeline runs continuously.

    Determinism: the z-test is evaluated ENTIRELY in integers. With
    per-type bucket count n, sum S = Σc and sum of squares Q = Σc²,

        (c - S/n)² > 9·(Q/n - S²/n²)   ⟺   (c·n - S)² > 9·(n·Q - S²)

    so no floating-point mean/stddev ever exists — both engines compute
    bit-identical BIGINTs (c ≤ 1e6, n ≤ 1e5 keeps every product far
    under 2^63 even at 1000× this data).

    100 TB shape: two hash aggregates (hour buckets, then per-type
    stats — the second input is tiny) and a broadcast join of the
    per-type stats back onto the buckets. No window function, no sort.
    """
    ev = load_sdf(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hh"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    st = hc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("q"),
    )
    dev = F.col("n_events") * F.col("n_buckets") - F.col("s")
    var_n2 = F.col("n_buckets") * F.col("q") - F.col("s") * F.col("s")
    return (
        hc.join(F.broadcast(st), "event_type")
        .filter((dev > 0) & (dev * dev > 9 * var_n2))
        .select(
            "event_type", "day", "hh", "n_events", "n_buckets",
            F.col("s").alias("type_total"),
        )
    )


@register(
    "rollup_hypertable",
    sql="""
    SELECT event_type, 'hour' AS grain,
           strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 3
    UNION ALL
    SELECT event_type, 'day',
           strftime(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S'),
           COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
    FROM events GROUP BY 1, 3
    UNION ALL
    SELECT event_type, 'month',
           strftime(time_bucket(INTERVAL '1 month', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S'),
           COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
    FROM events GROUP BY 1, 3
    """,
)
def rollup_hypertable(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup: the same measure at
    hour, day, and month granularity in ONE pass — GROUPING SETS over
    pre-truncated timestamps (one scan + one Expand×3 + one hash
    aggregate), where the oracle's UNION-of-three-GROUP-BYs spelling
    scans the table three times. At 100 TB the single-scan shape is the
    difference between one pass over the lake and three; the Expand
    triples rows BEFORE the map-side partial agg collapses them, so the
    shuffle carries three small rollups, not 3× the data.

    Output grain is labeled from grouping() flags; buckets are
    formatted strings so all three granularities share one column.
    """
    ev = load_sdf(spark, sf_dir, "events")
    ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("month", "ts").alias("m"),
        "value",
    ).createOrReplaceTempView("_hypertable_src")
    return spark.sql(
        """
        SELECT event_type,
               CASE WHEN grouping(h) = 0 THEN 'hour'
                    WHEN grouping(d) = 0 THEN 'day'
                    ELSE 'month' END AS grain,
               date_format(coalesce(h, d, m), 'yyyy-MM-dd HH:mm:ss') AS bucket,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM _hypertable_src
        GROUP BY event_type, GROUPING SETS ((event_type, h), (event_type, d),
                                            (event_type, m))
        """
    )


@register(
    "ohlc_bars",
    sql="""
    SELECT event_type, window_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM (
      SELECT event_type, value,
             strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             ROW_NUMBER() OVER (
               PARTITION BY event_type,
                            time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
               ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (
               PARTITION BY event_type,
                            time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    GROUP BY 1, 2
    """,
)
def ohlc_bars(spark, sf_dir):
    """Hourly OHLC (open/high/low/close) downsampling bars per
    event_type — the canonical time-series resample.

    Open/close are picked by row_number over (ts, event_id) — the
    event_id tiebreak makes simultaneous events deterministic, which
    arg_min/arg_max on bare ts would not. One shuffle: the window's
    hash partitioning on (event_type, hour) is reused by the groupBy on
    the same keys (Catalyst elides the second exchange), and the
    per-bucket rank never windows over more than one bucket's rows —
    the same bounded-partition shape as ``window_topk``. Volume sums
    through DECIMAL per the registry policy; open/high/low/close are
    single row values (IEEE-exact, no summation order)."""
    ev = load_sdf(spark, sf_dir, "events")
    # project the bucket FIRST and key both the windows and the groupBy
    # on the same (event_type, __bucket) columns — Catalyst then reuses
    # the window's hash partitioning for the aggregate (one exchange
    # total); grouping on the formatted string instead would force a
    # second shuffle (probed: 2 exchanges vs 1).
    bucketed = ev.select(
        "event_type",
        "value",
        "ts",
        "event_id",
        F.date_trunc("hour", "ts").alias("__bucket"),
    )
    w = Window.partitionBy("event_type", "__bucket")
    asc = w.orderBy("ts", "event_id")
    desc = w.orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = bucketed.select(
        "event_type",
        "value",
        "__bucket",
        F.row_number().over(asc).alias("rn_a"),
        F.row_number().over(desc).alias("rn_d"),
    )
    return (
        ranked.groupBy("event_type", "__bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("volume"),
        )
        .select(
            "event_type",
            F.date_format("__bucket", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume",
        )
    )


@register(
    "events_debounce",
    sql="""
    WITH o AS (
      SELECT event_type,
             CAST(ts AS TIMESTAMP) AS ts,
             LAG(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
      FROM events
    )
    SELECT event_type,
           SUM(CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 6 HOUR
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           SUM(CASE WHEN prev IS NOT NULL AND ts - prev < INTERVAL 6 HOUR
                    THEN 1 ELSE 0 END)::BIGINT AS n_dropped
    FROM o GROUP BY event_type
    """,
)
def events_debounce(spark, sf_dir):
    """Debounce / event-throttling: within each (user, event_type)
    stream, an event arriving less than 6 hours after its predecessor
    is a bounce (retry storms, double-clicks, duplicate webhooks at
    production scale) — report kept vs dropped per type. The rule
    compares to the previous RAW event (pure lag), so it is one window
    pass, not a stateful scan; the streaming twin of the concept is
    ``dropDuplicatesWithinWatermark`` (`stream_dedup`), which debounces
    on exact key instead of time gap. Ordering ties broken by
    event_id so both engines see identical lag frames.

    Scale shape: one shuffle on (user_id, event_type) — the same
    partitioning every per-user window op in this file reuses — then a
    type-keyed re-aggregate over 5 keys. No skew risk: the window key
    includes user_id."""
    from pyspark.sql import Window as W

    ev = load_sdf(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", "ts", F.lag("ts").over(w).alias("prev")
    )
    gap_ok = F.col("prev").isNull() | (
        F.unix_micros("ts") - F.unix_micros("prev") >= 6 * 3600 * 1_000_000
    )
    return o.groupBy("event_type").agg(
        F.sum(F.when(gap_ok, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(gap_ok, 0).otherwise(1)).cast("long").alias("n_dropped"),
    )


@register(
    "seasonality_profile",
    sql="""
    SELECT isodow(CAST(ts AS TIMESTAMP))::BIGINT AS dow,
           hour(CAST(ts AS TIMESTAMP))::BIGINT AS hod,
           COUNT(*)::BIGINT AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def seasonality_profile(spark, sf_dir):
    """Seasonality profile: event volume and value by (ISO day-of-week,
    hour-of-day) — the capacity-planning / anomaly-baseline aggregate
    every event pipeline maintains (the divisor behind "traffic is 3x
    its Tuesday-10am norm"). Spark's ``weekday()+1`` equals DuckDB's
    ``isodow`` (1=Monday..7=Sunday) — ``dayofweek`` does NOT line up
    across engines (Spark 1=Sunday, DuckDB 0=Sunday), which is the
    kind of calendar-convention trap this oracle row pins. Value sums
    follow the DECIMAL policy.

    Scale shape: single hash aggregate onto at most 168 keys,
    map-side combined — scan-bound at any corpus size."""
    ev = load_sdf(spark, sf_dir, "events")
    return ev.groupBy(
        (F.weekday("ts") + 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
        .alias("total_value"),
    )
