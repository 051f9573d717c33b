"""Bucketed-table co-located join: writing both sides bucketed on the
join key lets the join run with ZERO exchanges — the 100 TB answer to
repeated fact-fact joins on the same key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").option("path", str(wh / "orders_b"))
     .format("parquet").saveAsTable("orders_b"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").option("path", str(wh / "lineitem_b"))
     .format("parquet").saveAsTable("lineitem_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o = spark.table("orders_b")
    l = spark.table("lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself needs no Exchange: bucket layout satisfies the
        # hash-partitioning requirement on both sides
        pre_agg = plan.split("HashAggregate")[-1]  # section below the agg
        assert "SortMergeJoin" in plan
        assert "Exchange" not in pre_agg
        rows = {r.o_orderstatus: r["count"] for r in joined.collect()}
        assert sum(rows.values()) == l.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_scan_reports_buckets(spark, bucketed_tables):
    # a bare scan disables bucketing ("disabled by query planner"); the
    # bucket layout is surfaced when a join actually exploits it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, l = spark.table("orders_b"), spark.table("lineitem_b")
        plan = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
