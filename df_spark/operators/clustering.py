"""Connected components over a pair graph — the dedup-clustering step
that turns near-dup PAIRS into dedup GROUPS (keep one doc per
component).

Iterative min-label propagation: every node starts labeled with its own
id; each round, a node takes the minimum label among itself and its
neighbors; converged when no label changes. Rounds needed ≈ graph
diameter (≤ log n with the large-star/small-star variants; plain
propagation is fine for the shallow diameters of near-dup graphs).

This is the engine's iterative-algorithm pattern: the DATA stays
distributed (each round is two hash joins + an aggregate); only the
convergence CHECK (a count) touches the driver, and the loop count is
O(diameter), independent of data size. Labels are persisted per round
and the previous round unpersisted — bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id reachable.
    ``edges`` is undirected (each pair listed once, either order)."""
    # symmetric edge list (a->b and b->a) so propagation is undirected.
    # MUST be persisted: every iteration joins against it, and without
    # the cut each round would re-run the entire upstream pair pipeline
    # (e.g. MinHash+LSH) — measured minutes instead of seconds.
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("comp", F.col("node")).localCheckpoint(eager=True)

    # Each round is ONE join + hash-min: a node's new label is the min
    # over {its own label} ∪ {neighbor labels}, expressed as a union fed
    # into a single aggregate (the union of the self-labels replaces a
    # second left-join back onto the old labels). Convergence check
    # exploits monotonicity — min-labels only ever decrease — so labels
    # changed iff sum(comp) decreased: one cheap aggregate on the
    # checkpointed result instead of a join+count against the old round.
    prev_sum = None
    for _ in range(max_iter):
        neighbor_labels = sym.join(labels, sym.v == labels.node).select(
            F.col("u").alias("node"), F.col("comp")
        )
        new_labels = (
            neighbor_labels.unionByName(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # localCheckpoint TRUNCATES the lineage — persist alone caches
        # data but Catalyst still re-analyzes the ever-deepening plan
        # each round (measured: per-iteration time grows 2s → 20s by
        # round 3 without this)
        new_labels = new_labels.localCheckpoint(eager=True)
        # decimal sum: node ids are longs, so an int64 sum could overflow
        # under ANSI mode on a billion-node graph
        cur_sum = new_labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]
        labels = new_labels
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels


def dedup_groups(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full dedup grouping: every doc gets a group id (= min doc id of
    its near-dup component; singletons are their own group), plus the
    keep/drop decision."""
    comps = connected_components(pairs)
    out = (
        all_ids.select(F.col(id_col))
        .join(comps, all_ids[id_col] == comps.node, "left")
        .select(
            id_col,
            F.coalesce(F.col("comp"), F.col(id_col)).alias("group_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("group_id"))
    )
    return out
