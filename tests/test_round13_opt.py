"""Focused tests for the r13 OPTIMIZATION-round internals: the
load-time scan spread (sources.tables._spread_scan), the
pre-checkpoint spread helper (operators.partitioning.checkpoint_spread),
the minhash_est_audit bitmap verify, the data-sized multimodal codec
stages, and the bucket-key-routed bucketed write."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from df_spark.operators.partitioning import checkpoint_spread
from df_spark.sources import tables as T


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- scan spread gates ------------------------------------------------


def test_spread_gates_off_below_raw_floor(spark, sf_dir):
    # sf0.001 tables are all below the 200 KiB raw floor: no exchange
    for name in ("lineitem", "documents", "orders"):
        plan = _plan(T.load_sdf(spark, sf_dir, name))
        assert "Exchange" not in plan, (name, plan)


def test_spread_fires_sized_on_big_fact_table(spark):
    sf01 = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf01}/lineitem.parquet"):
        pytest.skip("sf0.1 testdata not present")
    plan = _plan(T.load_sdf(spark, sf01, "lineitem"))
    # ~10.8 MB raw -> width max(8, 10) capped at defaultParallelism (4
    # in the test session) -> the spread is present AND never wider
    # than the cluster
    assert "hashpartitioning(l_orderkey" in plan
    width = min(spark.sparkContext.defaultParallelism,
                max(T._SPREAD_FLOOR,
                    os.path.getsize(f"{sf01}/lineitem.parquet")
                    // T._SPREAD_PART_BYTES))
    assert f"hashpartitioning(l_orderkey#" in plan
    assert f", {width})" in plan.split("hashpartitioning(l_orderkey", 1)[1][:40]


def test_spread_env_toggle_restores_serial_plan(spark):
    sf01 = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf01}/lineitem.parquet"):
        pytest.skip("sf0.1 testdata not present")
    os.environ["SPARK_GRAFT_SPREAD_SCAN"] = "0"
    try:
        assert "Exchange" not in _plan(T.load_sdf(spark, sf01, "lineitem"))
    finally:
        os.environ["SPARK_GRAFT_SPREAD_SCAN"] = "1"


# --- checkpoint_spread ------------------------------------------------


def test_checkpoint_spread_widens_narrow_scan(spark, sf_dir):
    df = T.load_sdf(spark, sf_dir, "documents")  # 1 partition, no spread
    out = checkpoint_spread(df)
    assert "Repartition" in out._jdf.queryExecution().optimizedPlan().toString()


def test_checkpoint_spread_rewidens_narrow_explicit_spread(spark, sf_dir):
    par = spark.sparkContext.defaultParallelism
    df = T.load_sdf(spark, sf_dir, "documents").repartition(2, F.col("doc_id"))
    out = checkpoint_spread(df)
    got = out.localCheckpoint(eager=True).rdd.getNumPartitions()
    assert got == par


def test_checkpoint_spread_leaves_aggregates_alone(spark, sf_dir):
    agg = (T.load_sdf(spark, sf_dir, "documents")
           .groupBy("source").agg(F.count(F.lit(1)).alias("n")))
    out = checkpoint_spread(agg)
    assert out is agg  # no extra exchange on shuffle-width frames


def test_checkpoint_spread_respects_width_override(spark, sf_dir):
    df = T.load_sdf(spark, sf_dir, "documents")
    out = checkpoint_spread(df, width=2)
    assert out.localCheckpoint(eager=True).rdd.getNumPartitions() == 2


# --- minhash_est_audit bitmap verify ---------------------------------


def test_est_audit_uses_bitmap_popcounts_not_arrays(spark, sf_dir):
    from df_spark.queries import load_registry

    reg = load_registry()
    sdf = reg["minhash_est_audit"].fn(spark, sf_dir)
    plan = _plan(sdf)
    assert "bit_count" in plan
    assert "array_intersect" not in plan


# --- codec stage sizing ----------------------------------------------


def test_codec_input_sized_by_data_not_spread(spark, sf_dir):
    from df_spark.multimodal import _codec_input

    docs = T.load_sdf(spark, sf_dir, "documents").repartition(4)
    out = _codec_input(docs)
    # tiny corpus -> one python task regardless of upstream width
    assert out.rdd.getNumPartitions() == 1


# --- bucketed write routing ------------------------------------------


def test_bucketed_layout_one_file_per_bucket(spark, sf_dir):
    from df_spark.queries import load_registry

    reg = load_registry()
    reg["bucketed_join"].fn(spark, sf_dir).collect()
    import hashlib
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = spark.table(f"lineitem_b_{sfx}")
    files = tbl.inputFiles()
    # 8 buckets, bucket-key-routed write: at most one parquet file per
    # bucket (empty buckets may write none)
    assert 0 < len(files) <= 8, files
