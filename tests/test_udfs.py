"""UDF-tier tests: vectorized pandas UDFs and grouped applyInPandas."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from df_spark.functions.udfs import unit_normalize, winsorize_99, zscore_per_group


def test_winsorize(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("x"))
    out = df.select(winsorize_99(F.col("x")).alias("w")).collect()
    vals = [r.w for r in out]
    assert max(vals) < 99.0 and min(vals) > 0.0
    assert len(vals) == 100


def test_unit_normalize(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(10)
    out = emb.select("vec_id", unit_normalize(F.col("embedding")).alias("u")).collect()
    for r in out:
        norm = math.sqrt(sum(x * x for x in r.u))
        assert abs(norm - 1.0) < 1e-9


def test_zscore_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)], "g string, v double")
    rows = zscore_per_group(df, "g", "v").collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r.zscore)
    assert sorted(by_g["a"]) == [-1.0, 0.0, 1.0]
    assert by_g["b"] == [0.0]  # single-row group: std undefined → 0


def test_zlib_compression_ratio_orders_quality(spark):
    """Repetitive text must compress harder (lower ratio) than diverse
    text, and the query's ratio must be reproducible run-to-run."""
    from pyspark.sql import functions as F

    from df_spark.functions.udfs import zlib_bytes

    df = spark.createDataFrame(
        [(1, "spam " * 200), (2, " ".join(f"w{i}x{i*7%97}" for i in range(200)))],
        "doc_id: long, text: string",
    )
    out = {
        r.doc_id: r.c / r.n
        for r in df.select(
            "doc_id",
            zlib_bytes(F.col("text")).alias("c"),
            F.length("text").cast("long").alias("n"),
        ).collect()
    }
    assert out[1] < 0.1 < out[2]


def test_doc_compression_query_shape(spark, sf_dir):
    from df_spark.queries import load_registry

    rows = load_registry()["doc_compression"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.c_bytes
        assert abs(r.ratio - r.c_bytes / r.n_chars) < 1e-6
