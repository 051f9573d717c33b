"""Reference-parity queries (SURVEY §2 operator inventory), each with a
DuckDB oracle.

The flagship is TPC-H Q1 exactly as the reference client hand-builds it
(reference ``client.py:259-331``): filter → select(arith exprs) →
group_by(2) → aggregate → order_by. Implemented through the engine's
fluent ``Df`` API so the oracle checks the engine surface end-to-end.

Money aggregates go through DECIMAL (exact, order-independent) and are
cast back to DOUBLE — see package docstring for the determinism policy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..expr import Aggregator, Predicate, c, raw
from ..sources.tables import load_table
from . import register


def _dec(col, scale: str = "18,2"):
    return col.cast(f"decimal({scale})")


@register(
    "q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    agg = (
        li.filter(c("l_shipdate") <= "1998-09-02 00:00:00")
        .select(
            "l_returnflag",
            "l_linestatus",
            raw(_dec(F.col("l_quantity"))).alias("sum_qty"),
            raw(_dec(F.col("l_extendedprice"))).alias("sum_base_price"),
            raw(_dec(disc_price, "28,10")).alias("sum_disc_price"),
            raw(_dec(charge, "28,10")).alias("sum_charge"),
            raw(_dec(F.col("l_discount"))).alias("avg_disc"),
            raw(F.col("l_quantity")).alias("count_order"),
        )
        .group_by("l_returnflag", "l_linestatus")
        .aggregate(
            {
                "sum_qty": Aggregator.SUM,
                "sum_base_price": Aggregator.SUM,
                "sum_disc_price": Aggregator.SUM,
                "sum_charge": Aggregator.SUM,
                "avg_disc": Aggregator.SUM,
                "count_order": Aggregator.COUNT,
            }
        )
    )
    out = agg.select(
        "l_returnflag",
        "l_linestatus",
        raw(F.col("sum_qty").cast("double")).alias("sum_qty"),
        raw(F.col("sum_base_price").cast("double")).alias("sum_base_price"),
        raw(F.round(F.col("sum_disc_price"), 2).cast("double")).alias("sum_disc_price"),
        raw(F.round(F.col("sum_charge"), 2).cast("double")).alias("sum_charge"),
        raw(F.col("sum_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        raw(F.col("sum_base_price").cast("double") / F.col("count_order")).alias("avg_price"),
        raw(F.col("avg_disc").cast("double") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    ).order_by("l_returnflag", "l_linestatus")
    return out.to_spark()


@register(
    "filter_predicates",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity >= 49.0 AND l_returnflag = 'R'
    """,
)
def filter_predicates(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter("l_quantity", Predicate.gte(49.0))
        .filter("l_returnflag", Predicate.eq("R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .to_spark()
    )


@register(
    "select_arith",
    sql="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey + l_suppkey AS key_sum,
           l_orderkey * 2 AS key_double,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_orderkey / l_linenumber AS key_ratio
    FROM lineitem
    WHERE l_quantity > 45.0
    """,
)
def select_arith(spark, sf_dir):
    # int/int division yields double on both engines (reference rule:
    # Divide → Float, src/block.rs:496-501)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter("l_quantity", Predicate.gt(45.0))
        .select(
            "l_orderkey",
            "l_linenumber",
            (c("l_orderkey") + c("l_suppkey")).alias("key_sum"),
            (c("l_orderkey") * 2).alias("key_double"),
            (c("l_extendedprice") * (1 - c("l_discount"))).alias("net_price"),
            (c("l_orderkey") / c("l_linenumber")).alias("key_ratio"),
        )
        .to_spark()
    )


@register(
    "orderby_limit",
    sql="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem
    ORDER BY l_returnflag, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def orderby_limit(spark, sf_dir):
    # Catalyst turns sort+limit into TakeOrderedAndProject: per-partition
    # top-N then a driver-side merge of N — no global sort at scale.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            raw(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("ship_day"),
        )
        .order_by("l_returnflag", "l_orderkey", "l_linenumber")
        .limit(100)
        .to_spark()
    )


@register(
    "group_collect",
    sql="""
    SELECT o_orderpriority,
           array_to_string(list_sort(array_agg(o_orderkey)), ',') AS order_keys
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def group_collect(spark, sf_dir):
    # the reference's group_by-without-aggregate semantics: non-key
    # columns become per-group lists (src/dataframe.rs:388-396)
    orders = load_table(spark, sf_dir, "orders")
    grouped = orders.select("o_orderpriority", "o_orderkey").group_by("o_orderpriority")
    return grouped.select(
        "o_orderpriority",
        raw(
            F.array_join(
                F.transform(F.array_sort(F.col("o_orderkey")), lambda x: x.cast("string")),
                ",",
            )
        ).alias("order_keys"),
    ).to_spark()


@register(
    "agg_global",
    sql="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(l_quantity) AS n_rows,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.select(
            raw(_dec(F.col("l_extendedprice"))).alias("sum_price"),
            raw(F.col("l_quantity")).alias("n_rows"),
            raw(F.col("l_quantity")).alias("min_qty"),
            raw(F.col("l_quantity")).alias("max_qty"),
            raw(_dec(F.col("l_quantity"))).alias("avg_qty"),
        )
        .aggregate(
            {
                "sum_price": Aggregator.SUM,
                "n_rows": Aggregator.COUNT,
                "min_qty": Aggregator.MIN,
                "max_qty": Aggregator.MAX,
                "avg_qty": Aggregator.SUM,
            }
        )
    )
    return agg.select(
        raw(F.col("sum_price").cast("double")).alias("sum_price"),
        "n_rows",
        "min_qty",
        "max_qty",
        raw(F.col("avg_qty").cast("double") / F.col("n_rows")).alias("avg_qty"),
    ).to_spark()


@register(
    "join_inner",
    sql="""
    SELECT o_orderkey, o_custkey, c_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark, sf_dir):
    # single-key inner equi-join, both key columns kept (reference
    # src/dataframe.rs:448-476). customer is small → broadcast-hash
    # join, no shuffle of the fact side.
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, "o_custkey", "c_custkey")
        .select("o_orderkey", "o_custkey", "c_custkey", "c_name", "o_totalprice")
        .to_spark()
    )


@register(
    "join_3way_agg",
    sql="""
    SELECT r_name,
           COUNT(c_custkey) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_3way_agg(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(nation, "c_nationkey", "n_nationkey", broadcast=True).join(
        region, "n_regionkey", "r_regionkey", broadcast=True
    )
    agg = (
        joined.select(
            "r_name",
            raw(F.col("c_custkey")).alias("n_cust"),
            raw(_dec(F.col("c_acctbal"))).alias("total_bal"),
        )
        .group_by("r_name")
        .aggregate({"n_cust": Aggregator.COUNT, "total_bal": Aggregator.SUM})
    )
    return agg.select(
        "r_name", "n_cust", raw(F.col("total_bal").cast("double")).alias("total_bal")
    ).to_spark()


@register(
    "join_anti_semi",
    sql="""
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN has_big THEN 0 ELSE 1 END) AS BIGINT) AS n_without_big,
           CAST(SUM(CASE WHEN has_big THEN 1 ELSE 0 END) AS BIGINT) AS n_with_big
    FROM (
      SELECT c_custkey, c_mktsegment,
             EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_totalprice > 300000.0) AS has_big
      FROM customer
    )
    GROUP BY c_mktsegment
    """,
)
def join_anti_semi(spark, sf_dir):
    # left-anti + left-semi joins (extension: the reference is
    # inner-only, src/dataframe.rs:448-476). The filtered orders side
    # shrinks to a key list before the two broadcast joins, so the
    # customer table is never shuffled.
    customer = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter("o_totalprice", Predicate.gt(300000.0))
        .select("o_custkey")
    )
    without = (
        customer.join(big, "c_custkey", "o_custkey", how="left_anti")
        .select("c_mktsegment", raw(F.col("c_custkey")).alias("n_without_big"))
        .group_by("c_mktsegment")
        .aggregate({"n_without_big": Aggregator.COUNT})
    )
    with_ = (
        customer.join(big, "c_custkey", "o_custkey", how="left_semi")
        .select("c_mktsegment", raw(F.col("c_custkey")).alias("n_with_big"))
        .group_by("c_mktsegment")
        .aggregate({"n_with_big": Aggregator.COUNT})
    )
    return (
        without.join(with_, "c_mktsegment", "c_mktsegment", how="full_outer")
        .select(
            "c_mktsegment",
            raw(F.coalesce(F.col("n_without_big"), F.lit(0))).alias("n_without_big"),
            raw(F.coalesce(F.col("n_with_big"), F.lit(0))).alias("n_with_big"),
        )
        .to_spark()
    )


@register(
    "join_left_outer",
    sql="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_orders,
           COUNT(*) - COUNT(o_orderkey) AS n_unmatched
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey AND o_totalprice > 300000.0
    GROUP BY c_mktsegment
    """,
)
def join_left_outer(spark, sf_dir):
    # left-outer join with null-aware counting: COUNT(col) skips the
    # nulls introduced for unmatched left rows, COUNT(*) keeps them.
    customer = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter("o_totalprice", Predicate.gt(300000.0))
        .select("o_custkey", "o_orderkey")
    )
    joined = customer.join(big, "c_custkey", "o_custkey", how="left")
    return (
        joined.to_spark()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            (F.count(F.lit(1)) - F.count("o_orderkey")).alias("n_unmatched"),
        )
    )


@register(
    "union_distinct",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def union_distinct(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(raw(F.col("c_nationkey")).alias("nationkey"))
        .union(supplier.select(raw(F.col("s_nationkey")).alias("nationkey")))
        .distinct()
        .to_spark()
    )
