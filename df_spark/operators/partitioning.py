"""Partitioning helpers shared by operators that need an explicit
materialization barrier (a repartition exchange) before higher-order
function lambdas — Catalyst inlines cheap-looking aliases into HOF
lambdas, re-evaluating them per array element, and an exchange forces
the alias to materialize on the map side.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# logical-plan node names that put an exchange (or a full aggregation)
# below any physical plan built on top — reading `.rdd` on such a frame
# under AQE finalizes the plan and can trigger premature stage execution
_WIDE_NODES = (
    "Aggregate", "Join", "Sort", "Deduplicate", "Distinct", "Repartition",
    "RepartitionByExpression", "Window", "GlobalLimit", "Union", "Expand",
)


def _has_wide_node(df: DataFrame) -> bool:
    tree = df._jdf.queryExecution().optimizedPlan().toString()
    return any(
        line.lstrip(" +-:").startswith(_WIDE_NODES)
        for line in tree.splitlines()
    )


def checkpoint_spread(df: DataFrame, width: int | None = None) -> DataFrame:
    """Pre-``localCheckpoint`` spread: repartition only when the frame
    would otherwise MATERIALIZE narrower than the cluster's default
    parallelism. Call only immediately below a checkpoint — the
    checkpoint itself is the materialization barrier that keeps
    expensive aliases (regex normalization) from being inlined into
    consumer HOF lambdas, so unlike :func:`barrier_width` call sites no
    exchange is needed for plan-shape reasons. When the input already
    executes wide (the load-time scan spread, or any upstream
    exchange at the session's shuffle width), the extra round-robin
    shuffle the r2-r12 barrier paid here is pure cost — measured at
    sf0.1 it re-shuffled the whole normalized corpus once per build."""
    sc = df.sparkSession.sparkContext
    par = width or sc.defaultParallelism
    if _has_wide_node(df):
        # An explicit upstream repartition narrower than the target
        # width gets re-widened: the load-time scan spread sizes its
        # width for LIGHT per-row work (~1 MB of work per partition),
        # but a checkpoint feeding the dedup family's shingle explode +
        # per-shingle hashing wants the full width — materializing the
        # dedup corpus at the 9-wide sf0.1 docs spread measured
        # _build_dedup_minhash at 5.7 s wall vs 2.6 s at full width.
        # Aggregate/Join/Window nodes already materialize at the
        # session shuffle width — no re-spread for those.
        tree = df._jdf.queryExecution().optimizedPlan().toString()
        widths = [int(m) for m in re.findall(r"Repartition (\d+)", tree)]
        widths += [int(m) for m in re.findall(
            r"RepartitionByExpression .*?, (\d+)\n", tree)]
        if widths and max(widths) < par:
            return df.repartition(par)
        return df
    n = df.rdd.getNumPartitions()
    return df if n >= par else df.repartition(par)


def barrier_width(df: DataFrame) -> int:
    """Width for a materialization barrier.

    Never narrower than the cluster's default parallelism (spreads a
    single small input file across every core) NOR the input's current
    partition count (a constant would collapse a 100 TB scan with
    hundreds of thousands of splits into that constant). The result is
    the max of the two, so the barrier preserves scale-out in both
    regimes.

    Guard: ``df.rdd`` finalizes the physical plan — under AQE, calling
    it on a frame with an unexecuted shuffle upstream triggers premature
    stage execution (AQE materializes intermediate stages to plan the
    final one). All intended call sites pass scan-level or checkpointed
    frames; if a wide node is present anyway, the width is read from
    the plan itself (explicit ``Repartition n`` nodes) or falls back to
    ``defaultParallelism`` — ``.rdd`` is never touched on such frames.
    """
    sc = df.sparkSession.sparkContext
    if _has_wide_node(df):
        tree = df._jdf.queryExecution().optimizedPlan().toString()
        widths = [int(m) for m in re.findall(r"Repartition (\d+)", tree)]
        widths += [int(m) for m in re.findall(r"RepartitionByExpression .*?, (\d+)\n", tree)]
        return max([sc.defaultParallelism, *widths])
    return max(sc.defaultParallelism, df.rdd.getNumPartitions())


# One Python task per ~this many estimated input bytes for Arrow/pandas
# stages. A Python task carries ~0.3 CPU-s of fixed overhead regardless
# of data (worker spawn + interpreter imports + Arrow handshake,
# measured on a TRIVIAL 32-partition mapInPandas: ~10 CPU-s/pass, reuse
# conf notwithstanding), so unlike JVM stages a pandas stage must be
# sized by data volume, not core count: a 1 MB frame gets one task, a
# 100 TB corpus gets ~12M — still far beyond any cluster's cores.
PANDAS_TASK_BYTES = 8 << 20


def pandas_stage_width(df: DataFrame) -> int:
    """Width for a ``mapInPandas``/``applyInPandas`` stage: input size
    estimate (Catalyst plan stats — file bytes for scans, scaled by
    projected columns; no ``.rdd`` hazard) divided by
    :data:`PANDAS_TASK_BYTES`, floor 1. Callers repartition to this
    before the Arrow exchange so tiny local frames don't pay per-task
    Python overhead x cores, while big frames keep full spread."""
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    return max(1, est // PANDAS_TASK_BYTES)


# Budget for runtime-measured broadcast hints. localCheckpoint'd frames
# (LogicalRDD) carry no stats, so Catalyst/AQE assumes they are huge and
# plans shuffle joins even for a 6 MB side; operators that KNOW a
# materialized frame's size (one cheap agg over the checkpoint) hint the
# broadcast themselves when it fits. The cap keeps the decision honest
# at scale: a side that grows with the corpus stops fitting and the
# plan degrades gracefully to the shuffle join AQE would pick.
BROADCAST_BYTES_CAP = 64 << 20


def size_hinted(df: DataFrame, est_bytes: int | None,
                cap: int = BROADCAST_BYTES_CAP,
                fallback_hint: str | None = None) -> DataFrame | Column:
    """Broadcast ``df`` iff its runtime-measured size fits the cap;
    past the cap, optionally apply a join-strategy hint instead (e.g.
    ``"shuffle_hash"`` when the probe side is a huge intermediate that
    a sort-merge join would needlessly sort)."""
    if est_bytes is not None and est_bytes < cap:
        return F.broadcast(df)
    return df.hint(fallback_hint) if fallback_hint else df
