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
