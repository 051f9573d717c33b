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


@register(
    "q7_nation_volume",
    sql="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey,
    LATERAL (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    year(l_shipdate) AS l_year)
    WHERE (supp_nation = 'NATION_1' AND cust_nation = 'NATION_3')
       OR (supp_nation = 'NATION_3' AND cust_nation = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark, sf_dir):
    # TPC-H Q7 shape: bidirectional nation-pair volume by year — the
    # nation dim joins twice under different roles (supplier vs
    # customer side); both stay broadcast, the symmetric pair predicate
    # evaluates post-join, and one hash aggregate keys on the pair+year
    li = load_sdf(spark, sf_dir, "lineitem")
    orders = load_sdf(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_sdf(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_sdf(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_sdf(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("__ck"), F.col("n_name").alias("cust_nation"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_3")
    ) | ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == n1.__sk)
        .join(n2, cust.c_nationkey == n2.__ck)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    sql="""
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN rev
                               ELSE CAST(0 AS DECIMAL(28,10)) END), 2) AS DOUBLE)
             AS nation_revenue,
           CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS total_revenue
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)) AS rev,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN part ON l_partkey = p_partkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    # TPC-H Q8 shape: national market share — numerator (one nation's
    # suppliers) and denominator (all) in ONE pass via conditional sum;
    # a 7-table snowflake where every dim is reduced to the columns the
    # plan reads before meeting the fact
    li = load_sdf(spark, sf_dir, "lineitem")
    orders = load_sdf(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    nation = load_sdf(spark, sf_dir, "nation")
    region = load_sdf(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # customers restricted to the target region (customer→nation→region)
    cust_in_region = (
        load_sdf(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        .join(nation.select("n_nationkey", "n_regionkey"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        load_sdf(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(nation.select(F.col("n_nationkey").alias("__nk"),
                            F.col("n_name").alias("supp_nation")),
              F.col("s_nationkey") == F.col("__nk"))
        .select("s_suppkey", "supp_nation")
    )
    part = load_sdf(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    zero = F.lit(0).cast("decimal(28,10)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_in_region, orders.o_custkey == cust_in_region.c_custkey)
        .join(supp_nation, li.l_suppkey == supp_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(zero)), 2)
            .cast("double").alias("nation_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q10_returned_items",
    sql="""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2)
                AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    # TPC-H Q10 shape: lost-revenue ranking over returned items — date
    # + returnflag predicates push into the scans, nation broadcast,
    # top-N via TakeOrderedAndProject (no global sort)
    cust = load_sdf(spark, sf_dir, "customer")
    orders = load_sdf(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1996-07-01 00:00:00")
    ).select("o_orderkey", "o_custkey")
    li = load_sdf(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_sdf(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q13_order_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark, sf_dir):
    # TPC-H Q13 shape: customer order-count distribution — LEFT join so
    # order-less customers land in the c_count=0 bucket, then a second
    # aggregate over the first's output (two shuffles, both on uniform
    # keys; COUNT(col) skips the nulls the outer join introduces)
    cust = load_sdf(spark, sf_dir, "customer").select("c_custkey")
    orders = load_sdf(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    sql="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    # TPC-H Q15 shape: argmax over an aggregated view — the revenue agg
    # is computed once, its global max is a 1-row broadcast, and the
    # equality filter keeps every tied top supplier (exact decimal-
    # rounded doubles, so ties are engine-independent)
    li = load_sdf(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00")
    )
    supp = load_sdf(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(rev), 2).cast("double").alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("__max"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("__max"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity",
    sql="""
    SELECT CAST(ROUND(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                / 7.0, 2) AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS agg_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS cnt_qty
      FROM lineitem GROUP BY l_partkey
    ) part_agg ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_qty < sum_qty
    """,
)
def q17_small_quantity(spark, sf_dir):
    # TPC-H Q17 shape: correlated per-part average decorrelated into a
    # self-agg + join; the avg comparison is kept in exact decimal
    # arithmetic (qty*5*cnt < sum) so both engines pick identical rows
    li = load_sdf(spark, sf_dir, "lineitem")
    part = load_sdf(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    qty_dec = F.col("l_quantity").cast("decimal(18,2)")
    part_agg = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(qty_dec).alias("sum_qty"), F.count(F.lit(1)).alias("cnt_qty")
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(part_agg, li.l_partkey == part_agg.agg_partkey)
        .filter(qty_dec * 5 * F.col("cnt_qty") < F.col("sum_qty"))
    )
    total = F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2).cast("double")
    return joined.agg(
        F.round(total / 7.0, 2).cast("double").alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q22_idle_customers",
    sql="""
    WITH thresh AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg_bal FROM thresh)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    """,
)
def q22_idle_customers(spark, sf_dir):
    # TPC-H Q22 shape: above-average-balance customers gone idle (no
    # orders since 2000 — every synthetic customer has SOME order, so
    # the classic no-orders-ever predicate would be vacuous) —
    # scalar-subquery threshold (exact decimal sum → double, identical
    # in both engines), LEFT ANTI join against recent orders, nation
    # rollup
    cust = load_sdf(spark, sf_dir, "customer")
    orders = load_sdf(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01 00:00:00"
    ).select("o_custkey")
    nation = load_sdf(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    bal_dec = F.col("c_acctbal").cast("decimal(18,2)")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(bal_dec).cast("double") / F.count(F.lit(1))).alias("__avg_bal"))
    )
    return (
        cust.join(F.broadcast(thresh), F.col("c_acctbal") > F.col("__avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal_dec).cast("double").alias("totacctbal"),
        )
    )
