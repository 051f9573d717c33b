"""Bloom-prefiltered semi-join: exactness (no false negatives — the
final semi-join removes false positives), measured prune rate, and the
plan property the 100 TB story depends on (the bit-test filter sits
BEFORE the exchange/join, and only the 2 KB bloom row broadcasts via
the nested-loop attach)."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_spark.operators.bloom import bloom_build, bloom_might_contain, bloom_semi_join
from df_spark.sources.tables import load_sdf

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_semi_join_exact(spark):
    orders = load_sdf(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    dim = load_sdf(spark, SF_DIR, "customer").filter(
        F.col("c_acctbal") > 9000).select("c_custkey")
    got = {r.o_orderkey for r in
           bloom_semi_join(orders, "o_custkey", dim, "c_custkey").collect()}
    want = {r.o_orderkey for r in orders.join(
        dim.select(F.col("c_custkey").alias("o_custkey")), "o_custkey",
        "left_semi").collect()}
    assert got == want and want


def test_bloom_prunes_most_nonmembers(spark):
    orders = load_sdf(spark, SF_DIR, "orders").select("o_custkey")
    dim = load_sdf(spark, SF_DIR, "customer").filter(
        F.col("c_acctbal") > 9000).select("c_custkey")
    words = bloom_build(dim, "c_custkey")
    n_total = orders.count()
    n_candidates = orders.filter(
        bloom_might_contain(F.col("o_custkey"), words)).count()
    n_members = orders.join(
        dim.select(F.col("c_custkey").alias("o_custkey")), "o_custkey",
        "left_semi").count()
    # every member survives the bloom (no false negatives)...
    assert n_candidates >= n_members
    # ...and the false-positive overhead is small relative to the
    # non-member population (fp rate for 2 KB / ~100 keys is << 1%)
    assert (n_candidates - n_members) <= 0.05 * (n_total - n_members)


def test_bloom_filter_sits_below_shuffle_semi_join(spark):
    """The regime the operator exists for: dim NOT broadcastable. With
    the auto-broadcast threshold off, the semi-join is a shuffle join
    and the literal bloom bit-test must sit BELOW it on the fact scan
    (printed deeper), so non-candidates never reach the exchange. The
    literal-injection design exists precisely because a cross-join
    attach of a 1-row bloom frame gets floated ABOVE the semi-join by
    Catalyst's join reordering."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_sdf(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey")
        dim = load_sdf(spark, SF_DIR, "customer").filter(
            F.col("c_acctbal") > 9000).select("c_custkey")
        out = bloom_semi_join(orders, "o_custkey", dim, "c_custkey")
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan  # no 1-row join attach
    i_filter = plan.index("shiftleft")     # the bit-test filter
    i_semi = plan.index("LeftSemi")
    # executedPlan prints top-down: the semi-join ABOVE, filter BELOW
    assert i_semi < i_filter
