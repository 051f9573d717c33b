"""Advanced operator queries: as-of join, range join, exact
percentiles, distinct counting (exact + approx). The approx query has
no SQL oracle by design (HLL sketches differ per engine) — it takes the
driver's rows-only check, demonstrating that path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.joins import asof_join, range_join
from ..sources.tables import load_sdf
from . import register


@register(
    "asof_join_events",
    sql="""
    WITH merged AS (
      SELECT user_id, event_id, ts, event_type, value,
             1 AS src, NULL AS click_val
      FROM events WHERE event_type = 'purchase'
      UNION ALL BY NAME
      SELECT user_id, NULL AS event_id, ts, event_type, NULL AS value,
             0 AS src, value AS click_val
      FROM events WHERE event_type = 'click'
    ), carried AS (
      SELECT user_id, event_id, ts, value, src,
             LAST_VALUE(click_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, src
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS last_click_value
      FROM merged
    )
    SELECT user_id, event_id AS purchase_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_ts_us,
           value AS purchase_value, last_click_value
    FROM carried WHERE src = 1
    """,
)
def asof_join_events(spark, sf_dir):
    # for each purchase: the value of the user's most recent click at or
    # before it (union + carry-forward window; one shuffle on user_id)
    ev = load_sdf(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="user_id", left_time="ts", right_time="ts",
        right_cols=["value"], suffix="_click",
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
        F.col("value_click").alias("last_click_value"),
    )


@register(
    "range_join_bands",
    sql="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
             ('high', 150000.0, 100000000.0)
    )
    SELECT band, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_bands(spark, sf_dir):
    orders = load_sdf(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0), ("high", 150000.0, 1e8)],
        "band string, lo double, hi double",
    )
    return (
        range_join(orders, bands, "o_totalprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@register(
    "percentiles",
    sql="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75,
           MAX(o_totalprice) AS p_max
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentiles(spark, sf_dir):
    # exact percentiles (linear interpolation — same definition both
    # engines); percentile_approx is the sketch variant for 100 TB
    orders = load_sdf(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("p75"),
        F.max("o_totalprice").alias("p_max"),
    )


@register("approx_distinct", sql=None)  # rows-only: HLL sketches are engine-specific
def approx_distinct(spark, sf_dir):
    # sketches only — mixing count_distinct (Expand-based rewrite) with
    # TypedImperativeAggregate sketches in one agg is pathologically
    # slow; exact distinct counts live in events_type_stats
    li = load_sdf(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(2500)).alias("approx_median_price"),
    )


@register(
    "price_histogram",
    sql="""
    SELECT CAST(FLOOR(o_totalprice / 20000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def price_histogram(spark, sf_dir):
    # equi-width histogram — one hash aggregate on a derived bucket key;
    # the 100 TB shape for distribution profiling (no sort, no window)
    orders = load_sdf(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 20000.0).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )
