"""Tests for the two-phase top_k_per_group operator: local
mapInPandas pre-filter + global window must agree with the naive
single-window plan, across directions, nulls, and the fallback path.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from df_spark.frame import Df
from df_spark.operators.windows import top_k_per_group


def _naive_topk(sdf, keys, order_cols, k):
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        sdf.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    )


def test_topk_matches_naive_window(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = (
        top_k_per_group(
            Df.from_spark(orders),
            ["o_orderpriority"],
            [("o_totalprice", False), ("o_orderkey", True)],
            k=3,
            local_prefilter=True,
        )
        .to_spark()
        .select("o_orderpriority", "o_orderkey", "rn")
    )
    want = _naive_topk(
        orders,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    ).select("o_orderpriority", "o_orderkey", "rn")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_topk_mixed_directions_and_repartition(spark):
    rows = [(g, i, float((i * 37) % 100)) for g in ("a", "b") for i in range(200)]
    sdf = spark.createDataFrame(rows, "g string, i long, v double").repartition(7)
    got = (
        top_k_per_group(
            Df.from_spark(sdf), ["g"], [("v", True), ("i", False)], k=5,
            local_prefilter=True,
        )
        .to_spark()
        .select("g", "i", "v", "rn")
    )
    want = _naive_topk(sdf, ["g"], [F.col("v").asc(), F.col("i").desc()], 5).select(
        "g", "i", "v", "rn"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_topk_nulls_first_on_ascending(spark):
    rows = [("a", 1, None), ("a", 2, 5.0), ("a", 3, 1.0), ("b", 4, 2.0)]
    sdf = spark.createDataFrame(rows, "g string, i long, v double").repartition(3)
    got = (
        top_k_per_group(
            Df.from_spark(sdf), ["g"], [("v", True), ("i", True)], k=2,
            local_prefilter=True,
        )
        .to_spark()
        .select("g", "i", "rn")
    )
    # Spark ascending puts nulls first: (a,1) rn=1, (a,3) rn=2
    assert sorted(map(tuple, got.collect())) == [("a", 1, 1), ("a", 3, 2), ("b", 4, 1)]


def test_topk_string_specs_use_descending_flag(spark):
    rows = [("a", i) for i in range(10)]
    sdf = spark.createDataFrame(rows, "g string, i long")
    got = top_k_per_group(Df.from_spark(sdf), ["g"], ["i"], k=2, descending=True)
    assert sorted(r.i for r in got.to_spark().collect()) == [8, 9]


def test_topk_default_path_uses_window_group_limit(spark, sf_dir):
    # scale claim: the default JVM path must pre-limit per input
    # partition BEFORE the exchange (no full-table shuffle, no
    # low-cardinality straggler)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = top_k_per_group(
        Df.from_spark(orders),
        ["o_orderpriority"],
        [("o_totalprice", False), ("o_orderkey", True)],
        k=3,
    ).to_spark()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "MapInPandas" not in plan


def test_topk_bare_column_fallback(spark):
    # bare Column specs can't be introspected — single-window fallback
    rows = [("a", i) for i in range(10)]
    sdf = spark.createDataFrame(rows, "g string, i long")
    got = top_k_per_group(
        Df.from_spark(sdf), ["g"], [F.col("i").desc()], k=2
    )
    assert sorted(r.i for r in got.to_spark().collect()) == [8, 9]


def test_topk_groups_spanning_partitions(spark):
    # every partition holds every group; local phase must keep enough
    rows = [("g%d" % (i % 3), i) for i in range(300)]
    sdf = spark.createDataFrame(rows, "g string, i long").repartition(8)
    got = top_k_per_group(
        Df.from_spark(sdf), ["g"], [("i", False)], k=4, local_prefilter=True
    )
    out = sorted((r.g, r.i) for r in got.to_spark().collect())
    want = sorted(
        (f"g{g}", i) for g in range(3) for i in range(297 + g, 285 + g, -3)[:4]
    )
    want = sorted((g, i) for g, i in want)
    assert out == want


def test_window_distribution_bounds(spark, sf_dir):
    from df_spark.queries import load_registry

    rows = load_registry()["window_distribution"].fn(spark, sf_dir).collect()
    assert rows
    by_pri = {}
    for r in rows:
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume <= 1.0
        assert 1 <= r.decile <= 10
        by_pri.setdefault(r.o_orderpriority, []).append(r)
    for pri, rs in by_pri.items():
        assert max(r.cume for r in rs) == 1.0  # last row closes the CDF
        assert min(r.pct_rank for r in rs) == 0.0


def test_unpivot_metrics_melts_every_cell(spark, sf_dir):
    from pyspark.sql import functions as F

    from df_spark.queries import load_registry
    from df_spark.sources.tables import load_sdf

    rows = load_registry()["unpivot_metrics"].fn(spark, sf_dir).collect()
    flags = {r.l_returnflag for r in rows}
    metrics = {r.metric for r in rows}
    assert metrics == {"n_lines", "qty_centi", "disc_centi"}
    assert len(rows) == len(flags) * 3
    n_lines_total = sum(r.value for r in rows if r.metric == "n_lines")
    assert n_lines_total == load_sdf(spark, sf_dir, "lineitem").count()
