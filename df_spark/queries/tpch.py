"""Additional TPC-H-style queries adapted to the synthetic schema
(reference ships only Q1 — ``client.py:259-331``; these extend the
flagship set to exercise multi-way join + selective-filter + agg plans
at scale: broadcast dims, AQE join selection, partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_sdf
from . import register


@register(
    "q3_shipping_priority",
    sql="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2)
                AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    # TPC-H Q3 shape: selective dim filter → fact join → top-N revenue.
    # sort+limit compiles to TakeOrderedAndProject (per-partition top-N,
    # no global sort).
    cust = load_sdf(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_sdf(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15 00:00:00"
    )
    li = load_sdf(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15 00:00:00"
    )
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    )
    # both joins are AQE-decided: orders stays a fact after the date
    # filter, and customer scales with SF too — AQE broadcasts whichever
    # side is small at runtime
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_supplier_volume",
    sql="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_supplier_volume(spark, sf_dir):
    # TPC-H Q5 shape: snowflake dims (supplier→nation→region) reduced
    # to a key→name map before meeting the fact; AQE broadcasts it when
    # small, shuffles when not; one shuffle for the final aggregate
    li = load_sdf(spark, sf_dir, "lineitem")
    supp = load_sdf(spark, sf_dir, "supplier")
    nation = load_sdf(spark, sf_dir, "nation")
    region = load_sdf(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    )
    return (
        li.join(dims, li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
    )


@register(
    "q6_revenue_forecast",
    sql="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))), 2)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def q6_revenue_forecast(spark, sf_dir):
    # TPC-H Q6: pure scan-filter-agg — every predicate pushes to the
    # parquet scan; the plan is Scan→Filter→partial agg→final agg with
    # no shuffle of data rows (only 1-row partials)
    li = load_sdf(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01 00:00:00")
            & (F.col("l_shipdate") < "1995-01-01 00:00:00")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,10)")),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_orders",
    sql="""
    SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark, sf_dir):
    # TPC-H Q18 shape: HAVING over a grouped fact + dim joins + top-N.
    cust = load_sdf(spark, sf_dir, "customer")
    orders = load_sdf(spark, sf_dir, "orders")
    li = load_sdf(spark, sf_dir, "lineitem")
    qty = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    # joins are AQE-decided: lineitem⋈orders is fact-fact, and customer
    # scales with SF — the plan must survive a 1000x scale-up
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(qty.alias("__qty"))
        .filter(F.col("__qty") > 180)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            F.col("__qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@register(
    "q12_priority_class",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
)
def q12_priority_class(spark, sf_dir):
    # TPC-H Q12 shape (adapted: synthetic lineitem has no shipmode, so
    # the class column is l_returnflag): conditional CASE aggregation
    # after a fact-to-fact join. orders is projected to 2 columns so only
    # ~1/8 of its bytes reach the join.
    li = load_sdf(spark, sf_dir, "lineitem")
    orders = load_sdf(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # no forced broadcast: orders is a fact table, so AQE picks the join
    # strategy from runtime size (broadcast at small SF, shuffle at 100 TB)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    sql="""
    SELECT CAST((100.0 * promo_revenue) / total_revenue AS DOUBLE) AS promo_pct,
           promo_revenue, total_revenue
    FROM (
      SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))
                                 ELSE CAST(0 AS DECIMAL(28,10)) END), 2) AS DOUBLE) AS promo_revenue,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
    )
    """,
)
def q14_promo_revenue(spark, sf_dir):
    # TPC-H Q14 shape: promo-share of revenue — conditional vs total sum
    # in ONE pass over the joined fact (no second scan for the ratio's
    # denominator); part is projected to 2 columns and its join left to
    # AQE. Decimal sums → round → double ratio keeps both engines
    # bit-identical.
    li = load_sdf(spark, sf_dir, "lineitem")
    part = load_sdf(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    zero = F.lit(0).cast("decimal(28,10)")
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)), 2)
            .cast("double")
            .alias("promo_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        ((F.lit(100.0) * F.col("promo_revenue")) / F.col("total_revenue")).alias("promo_pct"),
        "promo_revenue",
        "total_revenue",
    )


@register(
    "q19_brand_quantity",
    sql="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_brand_quantity(spark, sf_dir):
    # TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    # bands across the join. Catalyst extracts the common implied
    # constraints and pushes the l_quantity range into the parquet scan;
    # the cross-table OR evaluates post-join in codegen.
    li = load_sdf(spark, sf_dir, "lineitem")
    part = load_sdf(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    def band(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(
            band("Brand#12", 5, 1, 11)
            | band("Brand#23", 10, 10, 20)
            | band("Brand#34", 15, 20, 30)
        )
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q4_order_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity > 49.0
    )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    # TPC-H Q4 shape: EXISTS correlated subquery → Catalyst rewrites to
    # a left-semi join (shown in PLANS.md); written via spark.sql to
    # exercise the subquery path end-to-end
    load_sdf(spark, sf_dir, "orders").createOrReplaceTempView("orders_q4")
    load_sdf(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders_q4
        WHERE EXISTS (
          SELECT 1 FROM lineitem_q4
          WHERE l_orderkey = o_orderkey AND l_quantity > 49.0
        )
        GROUP BY o_orderpriority
        """
    )
