"""Partitioning helpers shared by operators that need an explicit
materialization barrier (a repartition exchange) before higher-order
function lambdas — Catalyst inlines cheap-looking aliases into HOF
lambdas, re-evaluating them per array element, and an exchange forces
the alias to materialize on the map side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def barrier_width(df: DataFrame) -> int:
    """Width for a materialization barrier.

    Never narrower than the cluster's default parallelism (spreads a
    single small input file across every core) NOR the input's current
    partition count (a constant would collapse a 100 TB scan with
    hundreds of thousands of splits into that constant). The result is
    the max of the two, so the barrier preserves scale-out in both
    regimes.
    """
    sc = df.sparkSession.sparkContext
    return max(sc.defaultParallelism, df.rdd.getNumPartitions())
