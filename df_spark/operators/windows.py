"""Window-function operators — fills the reference's biggest gap
(SURVEY §2: "Window functions: none in the reference").

All helpers take and return the engine's ``Df`` and compile to
``pyspark.sql.Window`` specs: distributed hash-partition by the
partition keys + in-partition sort, no driver involvement. At 100 TB
the shuffle is on the partition keys — same cost profile as a groupBy
on those keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..frame import Df


def _order_cols(order_by: Sequence[str | Column], descending: bool) -> list[Column]:
    cols = []
    for o in order_by:
        if isinstance(o, Column):
            cols.append(o)
        else:
            cols.append(F.col(o).desc() if descending else F.col(o).asc())
    return cols


def top_k_per_group(
    df: Df,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    k: int,
    descending: bool = True,
    rank_col: str = "rn",
) -> Df:
    """Top-K rows per group via row_number. Include a unique tiebreaker
    in ``order_by`` for deterministic output."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by, descending))
    sdf = (
        df.to_spark()
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
    return Df.from_spark(sdf)


def with_rank(
    df: Df,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    kind: str = "row_number",
    out: str = "rank",
    descending: bool = False,
) -> Df:
    fn = {
        "row_number": F.row_number,
        "rank": F.rank,
        "dense_rank": F.dense_rank,
        "percent_rank": F.percent_rank,
        "ntile4": lambda: F.ntile(4),
    }[kind]
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by, descending))
    return Df.from_spark(df.to_spark().withColumn(out, fn().over(w)))


def with_running_agg(
    df: Df,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    agg_col: str | Column,
    agg: str = "sum",
    out: str = "running",
    rows_frame: bool = False,
) -> Df:
    """Cumulative aggregate (unbounded-preceding → current row)."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by, False))
    if rows_frame:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    col = F.col(agg_col) if isinstance(agg_col, str) else agg_col
    fn = {"sum": F.sum, "avg": F.avg, "count": F.count, "min": F.min, "max": F.max}[agg]
    return Df.from_spark(df.to_spark().withColumn(out, fn(col).over(w)))


def with_lag_lead(
    df: Df,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    col: str,
    offset: int = 1,
) -> Df:
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by, False))
    sdf = (
        df.to_spark()
        .withColumn(f"{col}_lag", F.lag(col, offset).over(w))
        .withColumn(f"{col}_lead", F.lead(col, offset).over(w))
    )
    return Df.from_spark(sdf)
