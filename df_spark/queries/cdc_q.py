"""CDC maintenance as an oracle-checked query: an SCD2 (slowly-changing
dimension, type 2) apply over a change log derived deterministically
from ``orders`` — the current snapshot is each customer's latest
pre-cutoff order, the update batch is each customer's first post-cutoff
order; updated keys get their history row closed out and the update row
appended as the new current version.

Exercises ``operators.cdc.scd2_apply`` (anti-join/left-join + union —
one shuffle on the key, the stock-Spark MERGE pattern when no lakehouse
format is on the classpath).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.cdc import scd2_apply
from ..sources.tables import load_sdf
from . import register

_CUTOFF = "1997-01-01 00:00:00"


@register(
    "cdc_scd2",
    sql=f"""
    WITH hist AS (
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
             TRUE AS is_current, CAST(NULL AS TIMESTAMP) AS end_ts
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
      ) WHERE rn = 1
    ),
    upd AS (
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
      ) WHERE rn = 1
    ),
    upd_keys AS (
      SELECT o_custkey, MIN(o_orderdate) AS new_ts FROM upd GROUP BY o_custkey
    ),
    closed AS (
      SELECT h.o_custkey, h.o_orderkey, h.o_totalprice, h.o_orderdate,
             CASE WHEN u.new_ts IS NOT NULL THEN FALSE ELSE TRUE END AS is_current,
             CASE WHEN u.new_ts IS NOT NULL THEN u.new_ts ELSE h.end_ts END AS end_ts
      FROM hist h LEFT JOIN upd_keys u ON h.o_custkey = u.o_custkey
    ),
    merged AS (
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate, is_current, end_ts
      FROM closed
      UNION ALL
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
             TRUE AS is_current, CAST(NULL AS TIMESTAMP) AS end_ts
      FROM upd
    )
    SELECT o_custkey, o_orderkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           strftime(end_ts, '%Y-%m-%d') AS end_day,
           is_current
    FROM merged
    """,
)
def cdc_scd2(spark, sf_dir):
    orders = load_sdf(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    pre = orders.filter(F.col("o_orderdate") < _CUTOFF)
    post = orders.filter(F.col("o_orderdate") >= _CUTOFF)
    w_hist = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    hist = (
        pre.withColumn("rn", F.row_number().over(w_hist))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("is_current", F.lit(True))
        .withColumn("end_ts", F.lit(None).cast("timestamp"))
    )
    w_upd = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    upd = (
        post.withColumn("rn", F.row_number().over(w_upd))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    out = scd2_apply(hist, upd, keys=["o_custkey"], ts_col="o_orderdate")
    return out.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.date_format("end_ts", "yyyy-MM-dd").alias("end_day"),
        "is_current",
    )


@register(
    "mv_incremental",
    sql="""
    SELECT event_type,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def mv_incremental(spark, sf_dir):
    """Incremental materialized-view maintenance: a per-(type, day)
    aggregate MV is refreshed by aggregating ONLY a newly-arrived delta
    and merging it into the existing MV state — never rescanning the
    base table. The oracle is the full recompute over all events, so the
    hash match PROVES refresh(base_mv, delta) == recompute(base ∪ delta).

    The delta here is the ~10% of events with event_id % 10 == 0 (a
    stand-in for one ingest batch); the base MV is the aggregate of the
    remaining 90%.

    100 TB story: the refresh cost is O(|delta|) + a merge join on the
    MV key — for a daily batch against a year-scale MV that is ~100×
    cheaper than recompute. COUNT/SUM merge by addition (both
    decimal-exact); the same shape maintains any commutative-monoid
    aggregate (min/max/HLL). AVG = merged sum/count at read time.
    """
    ev = load_sdf(spark, sf_dir, "events")
    key = ["event_type", "day"]

    def rollup(df):
        return df.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv_dec"),
        )

    base_mv = rollup(ev.filter(F.col("event_id") % 10 != 0))
    delta_mv = rollup(ev.filter(F.col("event_id") % 10 == 0))
    merged = (
        base_mv.alias("m")
        .join(delta_mv.alias("d"), key, "full_outer")
        .select(
            F.coalesce(F.col("m.event_type"), F.col("d.event_type")).alias("event_type"),
            F.coalesce(F.col("m.day"), F.col("d.day")).alias("day"),
            (
                F.coalesce(F.col("m.n_events"), F.lit(0))
                + F.coalesce(F.col("d.n_events"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("m._tv_dec"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("d._tv_dec"), F.lit(0).cast("decimal(18,2)"))
            ).cast("double").alias("total_value"),
        )
    )
    return merged


@register(
    "merge_upsert",
    sql="""
    WITH chg AS (
      SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
             o_totalprice,
             o_orderdate, '0-MERGED' AS o_orderpriority, 'U' AS op
      FROM orders WHERE o_orderkey % 13 != 0 AND o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, 'D' AS op
      FROM orders WHERE o_orderkey % 13 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N' AS o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority, 'I' AS op
      FROM orders WHERE o_orderkey % 17 = 0
    ),
    merged AS (
      SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice,
             t.o_orderdate, t.o_orderpriority
      FROM orders t LEFT JOIN chg s ON t.o_orderkey = s.o_orderkey
      WHERE s.op IS NULL OR s.op NOT IN ('U', 'D')
      UNION ALL
      SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice,
             s.o_orderdate, s.o_orderpriority
      FROM chg s JOIN orders t ON t.o_orderkey = s.o_orderkey
      WHERE s.op = 'U'
      UNION ALL
      SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice,
             s.o_orderdate, s.o_orderpriority
      FROM chg s LEFT JOIN orders t ON t.o_orderkey = s.o_orderkey
      WHERE s.op = 'I' AND t.o_orderkey IS NULL
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           o_orderpriority
    FROM merged
    """,
)
def merge_upsert(spark, sf_dir):
    """MERGE INTO (upsert + delete + insert in one statement) against
    the orders snapshot, via ``operators.cdc.merge_apply`` — the
    lakehouse writeback primitive expressed as ONE full-outer join on
    the key (stock Spark, no Delta/Iceberg jars). The changeset is
    derived deterministically from orders itself: keys ≡0 (mod 13)
    are deletes, remaining keys ≡0 (mod 7) are updates (status 'X',
    priority '0-MERGED'), and keys ≡0 (mod 17) re-keyed +1e8 are
    inserts. The oracle recomputes the same MERGE as three
    clause-gated joins, with the target-survival branch gated the way
    ``merge_apply`` gates it: a target row survives when it matches NO
    change row OR its matching change fires no clause (op outside
    {'U','D'} — e.g. a matched 'I'), not merely when unmatched.

    Scale shape: one shuffle per side hashed on o_orderkey (AQE
    broadcasts a small change batch); the when-clause gating is a
    row-local CASE after the join — no second pass, no window. At
    100 TB this is exactly Delta's MERGE join plan; the file rewrite
    a real table format adds happens in the sink, not the plan."""
    from ..operators.cdc import merge_apply

    orders = load_sdf(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    upd = (
        orders.filter((k % 13 != 0) & (k % 7 == 0))
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("o_orderpriority", F.lit("0-MERGED"))
        .withColumn("op", F.lit("U"))
    )
    dels = orders.filter(k % 13 == 0).withColumn("op", F.lit("D"))
    ins = (
        orders.filter(k % 17 == 0)
        .withColumn("o_orderkey", k + 100000000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("op", F.lit("I"))
    )
    changes = upd.unionByName(dels).unionByName(ins)
    merged = merge_apply(orders, changes, keys=["o_orderkey"])
    return merged.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        "o_orderpriority",
    )
