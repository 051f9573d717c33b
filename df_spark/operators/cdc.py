"""CDC-style table maintenance without a lakehouse format: MERGE
(upsert) and SCD2 history emulated with anti-join + union + window —
the stock-Spark pattern when Delta/Iceberg jars aren't on the
classpath. Each operation is one shuffle on the key (both sides hashed
on ``keys``); writers pair this with ``foreachBatch`` for streaming
upserts (see ``streaming.sinks``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE semantics: rows from ``updates`` replace same-key rows in
    ``target``; unmatched target rows pass through. If ``updates`` has
    several rows per key, all are kept (dedupe upstream if needed)."""
    keys = list(keys)
    surviving = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return surviving.unionByName(updates.select(*target.columns))


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    current_flag: str = "is_current",
    end_ts: str = "end_ts",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows whose key
    receives an update (set ``end_ts`` + clear the flag) and append the
    update rows as the new current versions."""
    keys = list(keys)
    upd_keys = updates.select(
        *keys, F.col(ts_col).alias("__new_ts")
    ).groupBy(*keys).agg(F.min("__new_ts").alias("__new_ts"))
    # no forced broadcast: the update batch scales with the feed; AQE
    # broadcasts from runtime size when it fits
    closed = (
        history.join(upd_keys, keys, "left")
        .withColumn(
            end_ts,
            F.when(
                F.col(current_flag) & F.col("__new_ts").isNotNull(), F.col("__new_ts")
            ).otherwise(F.col(end_ts)),
        )
        .withColumn(
            current_flag,
            F.when(F.col("__new_ts").isNotNull(), F.lit(False)).otherwise(
                F.col(current_flag)
            ),
        )
        .drop("__new_ts")
    )
    fresh = (
        updates.withColumn(current_flag, F.lit(True))
        .withColumn(end_ts, F.lit(None).cast(history.schema[end_ts].dataType))
    )
    return closed.unionByName(fresh.select(*history.columns))


def latest_per_key(df: DataFrame, keys: Sequence[str], ts_col: str) -> DataFrame:
    """Compact a change log to the latest row per key (row_number over
    the key partition; ties broken by all remaining columns are the
    caller's responsibility — include a sequence column in ``ts_col``
    ordering for exactly-once logs)."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_apply(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Full MERGE INTO semantics over an op-tagged changeset in ONE
    full-outer join on the key:

    - matched  + op='D' → row deleted
    - matched  + op='U' → row replaced by the change row's values
    - unmatched + op='I' → change row inserted
    - unmatched target rows pass through; a change row that fires no
      clause ('U'/'D' with no match, 'I' with a match, unknown ops)
      is a no-op — the target row, if any, survives untouched,
      mirroring SQL MERGE's when-clause gating.

    ``changes`` must carry all of ``target``'s columns plus ``op_col``.
    One shuffle per side on ``keys`` (AQE broadcasts a small batch);
    this is the Delta/Iceberg MERGE plan shape minus the file rewrite,
    which a lakehouse sink would do in ``foreachBatch``."""
    keys = list(keys)
    cols = target.columns
    op = F.col(f"s.{op_col}")
    # key columns are coalesced by the USING join; presence of each side
    # is detected via a pre-join constant flag (data columns may hold
    # genuine NULLs, so they can't serve as presence markers)
    t = target.withColumn("__t", F.lit(True)).alias("t")
    s = changes.withColumn("__s", F.lit(True)).alias("s")
    j = t.join(s, keys, "full_outer")
    matched = F.col("t.__t").isNotNull() & F.col("s.__s").isNotNull()
    # target survives when untouched OR when the matching change row
    # fires no matched-clause (anything but U/D)
    keep_target = F.col("t.__t").isNotNull() & (
        F.col("s.__s").isNull() | ~op.isin("U", "D")
    )
    take_update = matched & (op == "U")
    take_insert = F.col("t.__t").isNull() & (op == "I")
    data_cols = [c for c in cols if c not in keys]
    out = j.filter(keep_target | take_update | take_insert).select(
        *keys,
        *[
            F.when(keep_target, F.col(f"t.{c}"))
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
            for c in data_cols
        ],
    )
    return out.select(*cols)
