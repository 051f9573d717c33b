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
    # customer/orders broadcast against lineitem; sort+limit compiles to
    # TakeOrderedAndProject (per-partition top-N, no global sort).
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
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
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
    # TPC-H Q5 shape: snowflake dims (supplier→nation→region) broadcast
    # onto the fact; one shuffle for the final small aggregate
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
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
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
    # TPC-H Q18 shape: HAVING over a grouped fact + dim joins + top-N
    cust = load_sdf(spark, sf_dir, "customer")
    orders = load_sdf(spark, sf_dir, "orders")
    li = load_sdf(spark, sf_dir, "lineitem")
    qty = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
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
