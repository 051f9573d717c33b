"""Hierarchical / recursive-query family: root-distance (depth) over a
deterministic synthetic forest on the customer table.

The reference engine (like Spark) has no recursive CTE; DuckDB does —
so the oracle is a genuine ``WITH RECURSIVE`` walk while the Spark side
uses POINTER DOUBLING: each round a node's known ancestor jumps twice
as far, so a depth-D forest resolves in ceil(log2 D) distributed joins
instead of D sequential ones. That is the 100 TB shape for hierarchy
traversal (org charts, BOM explosions, thread trees): round count is
logarithmic in the longest chain, every round is one equi-join that
AQE sizes (the jump table broadcasts while it fits), and only a
bounded convergence scalar ever reaches the driver — the same contract
as ``operators/clustering.py``'s connected components.

Forest construction: parent(k) = h32(k) % k (strictly less than k, so
chains terminate at the virtual root 0; custkeys are contiguous from 1
so every parent exists). Expected depth is O(log n) — harmonic descent
— but the loop is convergence-checked, not depth-assumed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hashing import h32, h32_sql
from ..operators.partitioning import size_hinted
from ..sources.tables import load_sdf
from . import register


@register(
    "tree_depths",
    sql=f"""
    WITH RECURSIVE par AS (
      SELECT c_custkey AS k,
             {h32_sql("CAST(c_custkey AS VARCHAR)")} % c_custkey AS p
      FROM customer WHERE c_custkey >= 1
    ),
    walk AS (
      SELECT k AS node, p AS anc, 1 AS d FROM par
      UNION ALL
      SELECT w.node, par.p, w.d + 1
      FROM walk w JOIN par ON w.anc = par.k
    )
    SELECT node AS custkey, d AS depth FROM walk WHERE anc = 0
    UNION ALL
    SELECT 0 AS custkey, 0 AS depth
    """,
)
def tree_depths(spark, sf_dir):
    cust = load_sdf(spark, sf_dir, "customer")
    # custkeys are 0-based: node 0 IS the root (depth 0); every k >= 1
    # gets parent h32(k) % k < k, so chains strictly descend to 0
    par = cust.filter(F.col("c_custkey") >= 1).select(
        F.col("c_custkey").alias("node"),
        (h32(F.col("c_custkey").cast("string")) % F.col("c_custkey")).alias("anc"),
        F.lit(1).cast("long").alias("d"),
    )
    n_nodes = par.count()
    state_bytes = n_nodes * 48
    # single state table (node, anc, d), CHECKPOINTED each round: every
    # round is then exactly one join over one materialized input.
    # (Keeping settled rows in a separate lazily-unioned accumulator
    # re-executes all prior rounds every round — Θ(2^rounds) plan
    # growth, caught by a plan probe showing 16 scans for 4 rounds.)
    #
    # Loop-state partitioning is sized to the STATE (~48 B/node), not
    # the input scan (r13): the checkpoint freezes its partition count
    # into every later round, and a ceil(log2 D)-round loop of
    # per-round jobs pays task-scheduling overhead × partitions ×
    # rounds on near-empty tasks when the state rides the scan's
    # spread width. coalesce (no shuffle) caps it at one partition per
    # ~32 MB of state — 1 locally, wide again when the hierarchy is
    # actually large.
    state_parts = max(1, state_bytes // (32 << 20))
    state = par.coalesce(state_parts)
    while True:
        state = state.localCheckpoint(eager=True)
        if state.filter(F.col("anc") != 0).count() == 0:
            break
        jt = size_hinted(
            state.select(
                F.col("node").alias("j_node"),
                F.col("anc").alias("j_anc"),
                F.col("d").alias("j_d"),
            ),
            state_bytes,
        )
        settled = state.filter(F.col("anc") == 0)
        nxt = (
            state.filter(F.col("anc") != 0)
            .join(jt, F.col("anc") == F.col("j_node"))
            .select(
                "node",
                F.col("j_anc").alias("anc"),
                (F.col("d") + F.col("j_d")).alias("d"),
            )
        )
        state = settled.unionByName(nxt)
    root = spark.createDataFrame([(0, 0)], "custkey: long, depth: long")
    return state.select(
        F.col("node").alias("custkey"), F.col("d").alias("depth")
    ).unionByName(root)
