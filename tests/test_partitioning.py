"""barrier_width must track both default parallelism and the input's
partition count — never a constant that would collapse a large scan."""

from __future__ import annotations

from df_spark.operators.partitioning import barrier_width


def test_barrier_width_floors_at_default_parallelism(spark):
    sdf = spark.range(10).coalesce(1)
    assert barrier_width(sdf) == spark.sparkContext.defaultParallelism


def test_barrier_width_follows_wide_inputs(spark):
    wide = spark.sparkContext.defaultParallelism * 3
    sdf = spark.range(1000).repartition(wide)
    assert barrier_width(sdf) == wide


def test_zorder_layout_bounds_both_dims(spark, sf_dir, tmp_path):
    """Write events twice — clustered by the Morton z-value vs by x
    alone — and measure each file's (x, y) bounding rectangle via
    input_file_name. The z-layout must bound BOTH dimensions: its mean
    normalized y-width has to be far below the x-sorted layout's
    (which leaves y unclustered ≈ full range per file). This is the
    property that lets parquet min/max stats prune on either column."""
    from pyspark.sql import functions as F

    from df_spark.functions.hashing import zvalue
    from df_spark.sources.tables import load_sdf

    ev = load_sdf(spark, sf_dir, "events").select(
        (F.col("user_id") % 4096).cast("int").alias("x"),
        (F.hour("ts") * 60 + F.minute("ts")).cast("int").alias("y"),
    )
    n = ev.count()
    per_file = max(16, n // 16)  # ~16 files either way
    ev = ev.withColumn("z", zvalue(F.col("x"), F.col("y")))

    def mean_widths(sort_col, path):
        (ev.repartition(1).sortWithinPartitions(sort_col)
         .write.mode("overwrite")
         .option("maxRecordsPerFile", str(per_file)).parquet(path))
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max("x") - F.min("x")).alias("wx"),
                 (F.max("y") - F.min("y")).alias("wy"))
            .agg(F.avg("wx").alias("mx"), F.avg("wy").alias("my"))
            .collect()[0]
        )
        return stats.mx, stats.my

    zx, zy = mean_widths("z", str(tmp_path / "zorder"))
    lx, ly = mean_widths("x", str(tmp_path / "linear"))

    # linear x-sort clusters x tightly but leaves y at ~full range
    assert lx <= zx  # single-key sort is the best possible on x...
    assert zy < 0.6 * ly  # ...but z-order bounds y too, linear doesn't
    # and z still meaningfully clusters x (not a random shuffle of x)
    ymax = ev.agg(F.max("y")).collect()[0][0]
    assert zy < 0.6 * ymax
