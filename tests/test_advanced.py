"""Tests for as-of join, range join, and multi-table LSH recall."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from df_spark.operators.joins import asof_join, range_join
from df_spark.operators import similarity as S


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_basic(spark):
    trades = spark.createDataFrame(
        [(1, ts(10, 30), 100.0), (1, ts(11, 30), 101.0), (2, ts(10, 15), 50.0)],
        "sym long, t timestamp, px double")
    quotes = spark.createDataFrame(
        [(1, ts(10, 0), 99.0), (1, ts(11, 0), 100.5), (2, ts(12, 0), 51.0)],
        "sym long, t timestamp, bid double")
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="t",
                    right_cols=["bid"])
    got = {(r.sym, r.px): r.bid_asof for r in out.collect()}
    assert got == {
        (1, 100.0): 99.0,    # 10:30 sees the 10:00 quote
        (1, 101.0): 100.5,   # 11:30 sees the 11:00 quote
        (2, 50.0): None,     # 10:15 has no prior quote (12:00 is later)
    }


def test_asof_join_simultaneous_right_visible(spark):
    left = spark.createDataFrame([(1, ts(10), 1.0)], "k long, t timestamp, x double")
    right = spark.createDataFrame([(1, ts(10), 42.0)], "k long, t timestamp, y double")
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    right_cols=["y"]).collect()
    assert out[0].y_asof == 42.0  # ties: right row at the same instant counts


def test_range_join(spark):
    fact = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 25.0)], "id long, v double")
    bands = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 20.0)], "band string, lo double, hi double")
    got = {(r.id): r.band for r in range_join(fact, bands, "v").collect()}
    assert got == {1: "a", 2: "b"}  # 25.0 falls outside all bands


def test_multi_table_lsh_improves_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 30)
    bf = {(r.query_id, r.vec_id) for r in S.cosine_topk(emb, q, k=3).collect()}
    single = {(r.query_id, r.vec_id) for r in S.ann_lsh_topk(emb, q, k=3).collect()}
    multi = {(r.query_id, r.vec_id) for r in S.ann_multi_lsh_topk(emb, q, k=3).collect()}
    # OR-amplification can only widen the candidate set
    assert len(multi & bf) >= len(single & bf)
    assert len(multi) >= len(single)


def test_lsh_exact_duplicate_always_found(spark):
    # a vector identical to a query lands in the same bucket in EVERY
    # table → guaranteed candidate
    import pyspark.sql.types as T
    base = [0.1 * ((i % 7) - 3) for i in range(64)]
    rows = [(1, base), (2, base), (3, [-x for x in base])]
    emb = spark.createDataFrame(rows, T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()))]))
    q = emb.filter(F.col("vec_id") == 1)
    got = {(r.query_id, r.vec_id): r.cos_sim for r in
           S.ann_multi_lsh_topk(emb, q, k=5).collect()}
    assert (1, 2) in got
    assert abs(got[(1, 2)] - 1.0) < 1e-9


def test_ivf_exact_duplicate_always_found(spark):
    # an identical vector shares the query's nearest centroid, so it is
    # always in a probed cell (nprobe >= 1)
    import pyspark.sql.types as T
    rows = []
    for i in range(8):
        rows.append((i, [0.1 * ((d + i) % 7 - 3) for d in range(64)]))
    rows.append((100, rows[5][1]))  # exact dup of vec 5
    emb = spark.createDataFrame(rows, T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()))]))
    q = emb.filter(F.col("vec_id") == 5)
    got = {(r.query_id, r.vec_id): r.cos_sim for r in
           S.ivf_topk(emb, q, k=5, n_cells=4, nprobe=2).collect()}
    assert (5, 100) in got
    assert abs(got[(5, 100)] - 1.0) < 1e-9


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 30)
    bf = {(r.query_id, r.vec_id) for r in S.cosine_topk(emb, q, k=3).collect()}
    ivf = {(r.query_id, r.vec_id) for r in
           S.ivf_topk(emb, q, k=3, n_cells=16, nprobe=4).collect()}
    # probing 4/16 cells must still recover a solid share of true top-3
    assert len(ivf & bf) >= 0.5 * len(bf)


def test_salted_join_preserves_multiplicity(spark):
    from df_spark.operators.joins import salted_join
    # skewed left: key 1 dominates
    left = spark.createDataFrame([(1, i) for i in range(100)] + [(2, -1)],
                                 "k long, x long")
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")],
                                  "j long, tag string")
    out = salted_join(left, right, "k", "j", salt=4)
    assert out.count() == 101  # every left row matched exactly once
    tags = {r.tag for r in out.collect()}
    assert tags == {"hot", "cold"}


def test_approx_distinct_within_hll_tolerance(spark, sf_dir):
    """The `approx_distinct` query has no exact oracle (HLL sketches are
    engine-specific), but it IS falsifiable: the estimate must land
    within the configured relative standard deviation of the exact
    count. rsd=0.02 → assert within 5σ (0.1 relative error) — loose
    enough to never flake, tight enough to catch a broken sketch or a
    wrong-column regression."""
    import duckdb

    from df_spark.queries import load_registry

    row = load_registry()["approx_distinct"].fn(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    exact = con.execute(
        "SELECT count(DISTINCT l_orderkey), count(DISTINCT l_partkey), "
        "median(l_extendedprice) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()
    assert abs(row.approx_orders - exact[0]) <= max(5, 0.1 * exact[0])
    assert abs(row.approx_parts - exact[1]) <= max(5, 0.1 * exact[1])
    # percentile_approx(accuracy=2500): rank error ≤ n/2500; at test SF
    # assert the approximate median lies within the exact p40..p60 band
    p40, p60 = con.execute(
        "SELECT quantile_cont(l_extendedprice, 0.4), "
        "quantile_cont(l_extendedprice, 0.6) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()
    assert p40 <= row.approx_median_price <= p60


def test_ivf_kmeans_refinement_recall(spark, sf_dir):
    """Lloyd-refined centroids must not lose recall vs the deterministic
    lowest-id centroids (they usually gain: cells follow the data)."""
    from df_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 30)
    bf = {(r.query_id, r.vec_id) for r in S.cosine_topk(emb, q, k=3).collect()}
    base = {(r.query_id, r.vec_id) for r in
            S.ivf_topk(emb, q, k=3, n_cells=16, nprobe=4).collect()}
    refined = {(r.query_id, r.vec_id) for r in
               S.ivf_topk(emb, q, k=3, n_cells=16, nprobe=4, refine_iters=3).collect()}
    assert len(refined & bf) >= len(base & bf)


def test_kmeans_centroids_bounded_and_stable_ids(spark, sf_dir):
    from df_spark.operators.similarity import kmeans_refined_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_refined_centroids(emb, n_cells=8, n_iter=2)
    assert [c[0] for c in cents] == list(range(8))  # ids stable across rounds
    assert all(len(c[1]) == 64 for c in cents)


def test_embed_quantize_numpy_reference(spark, sf_dir):
    """embed_quantize vs a numpy SQ8 reference: identical q-norms,
    errors bounded by half a quantization step per dimension."""
    import numpy as np

    from df_spark.queries.similarity import embed_quantize

    out = {r["vec_id"]: r for r in embed_quantize(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    mat = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    ids = [r.vec_id for r in emb]
    scales = np.abs(mat).max(axis=0)
    scales[scales == 0] = 1.0
    q = np.floor(mat / scales * 127.0 + 0.5)
    err = mat - q * scales / 127.0
    assert np.abs(q).max() <= 127  # max-abs scaling never clips
    for i, vid in enumerate(ids):
        r = out[vid]
        assert r["qnorm"] == int((q[i] * q[i]).sum())
        # half-up vs numpy half-even: allow one picounit on the max
        assert abs(r["max_abs_err_pico"] - np.abs(err[i]).max() * 1e12) <= 1.0
        # every per-dim error is at most half a step (s / 254)
        assert r["max_abs_err_pico"] <= (scales / 254.0).max() * 1e12 + 1.0
        # np.round is half-even vs the engine's half-up: allow one
        # picounit per dimension for tie terms
        assert abs(r["sse_pico"] - int(np.round(err[i] * err[i] * 1e12).sum())) <= 64
