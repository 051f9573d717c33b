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
O(diameter), independent of data size. Each round's labels are
checkpointed and the PREVIOUS round's checkpoint storage is released
immediately (tracked through the persistent-RDD registry), so peak
storage is two label tables + the edge list — bounded, not O(rounds).

Large-star/small-star (Kiveris et al.) was considered and measured:
near-dup graphs here converge in ~6 plain rounds (diameter ≈ 5) at
~0.5 s/round, while star rounds double the per-round join count — the
crossover only pays on deep-chain graphs, so plain min-propagation
stays.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import size_hinted


def checkpoint_rdd_id(df: DataFrame) -> int:
    """RDD id backing a localCheckpoint'd frame, read off its own
    LogicalRDD plan node — NOT by diffing the process-global persistent-
    RDD registry, which under concurrent jobs (the threaded server)
    would capture another job's RDDs and later force-unpersist them."""
    return df._jdf.queryExecution().analyzed().rdd().id()


def _release(sc, rdd_ids: set[int]) -> None:
    """Free checkpointed RDD storage deterministically (Dataset.unpersist
    only talks to the CacheManager and ignores checkpoint storage;
    waiting for the ContextCleaner means storage grows with GC lag)."""
    reg = sc._jsc.getPersistentRDDs()
    for rid in rdd_ids:
        jrdd = reg.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id reachable.
    ``edges`` is undirected (each pair listed once, either order).

    STAR-CONTRACT, then iterate on the residual (Kiveris et al.'s
    single-round variant): near-dup graphs are unions of near-cliques,
    so one aggregation pass — label every node with min(self, min
    neighbor) straight off the edge list — collapses almost the whole
    graph; relabeling both edge endpoints through that partial labeling
    and dropping self-loops leaves a residual of inter-star edges
    (measured at sf0.1: 789k symmetric edges → 3.9k residual). The
    O(diameter) min-label-propagation loop then runs on the residual
    only, and a final broadcast join composes node → star label →
    residual component. Bit-identical labels to plain propagation
    (both converge to the component-min id), at a fraction of the
    per-round scan cost (112 → ~15 CPU-s at sf0.1).

    Every frame width is sized to the MEASURED edge count (~1M rows
    per task), never inherited from the upstream pair pipeline's
    compute width — on a small graph the loop runs in a couple of
    tasks; at 100 TB the same formula fans out to thousands.

    ``max_iter`` bounds the residual loop's PROPAGATION STEPS (rounded
    up to an even count — the loop materializes every two steps; the
    star pass is one extra aggregation, not counted). Warns
    (RuntimeWarning) if the budget passes without convergence — the
    returned labels are then a partial propagation."""
    sc = edges.sparkSession.sparkContext

    def tracked_checkpoint(df: DataFrame, width: int | None = None) -> tuple[DataFrame, set[int]]:
        # unconditional repartition when a width is given: probing the
        # current partition count via .rdd would finalize the physical
        # plan and can trigger premature stage execution under AQE
        # (see operators.partitioning.barrier_width's guard)
        if width is not None:
            df = df.repartition(width)
        out = df.localCheckpoint(eager=True)
        return out, {checkpoint_rdd_id(out)}

    # assumes `edges` is cheap to evaluate twice (count + checkpoint):
    # every internal caller passes an eagerly checkpointed pair frame;
    # ad-hoc callers with an expensive un-materialized plan should
    # checkpoint it first
    n_edges = edges.count()
    width = max(1, min(2 * n_edges // 1_000_000 + 1, sc.defaultParallelism))

    # symmetric edge list (a->b and b->a) so propagation is undirected.
    # MUST be materialized: the star pass and the contraction both scan
    # it, and without the cut each scan would re-run the entire
    # upstream pair pipeline (e.g. MinHash+LSH) — measured minutes
    # instead of seconds.
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym, sym_ids = tracked_checkpoint(
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))),
        width,
    )

    # star pass: ONE hash aggregate over the edge list — no join. The
    # per-node partial label is min(self, min neighbor); monotone, so
    # composing it below with the residual components still yields the
    # exact component-min.
    part, part_ids = tracked_checkpoint(
        sym.groupBy("u").agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("node"), F.least("mn", "u").alias("lbl"))
    )
    n_nodes = part.count()
    part_bytes = n_nodes * 48

    # contraction: relabel both endpoints through the star labels
    # (broadcast while the one-row-per-node table fits; size_hinted
    # degrades to shuffle joins past the cap), drop intra-star edges,
    # canonicalize + dedupe
    lu = size_hinted(
        part.select(F.col("node").alias("u"), F.col("lbl").alias("lu")), part_bytes)
    lv = size_hinted(
        part.select(F.col("node").alias("v"), F.col("lbl").alias("lv")), part_bytes)
    resid, resid_ids = tracked_checkpoint(
        sym.join(lu, "u").join(lv, "v")
        .filter(F.col("lu") != F.col("lv"))
        .select(F.least("lu", "lv").alias("u"), F.greatest("lu", "lv").alias("v"))
        .distinct()
    )
    n_resid = resid.count()

    converged = n_resid == 0
    held: set[int] = set()
    if not converged:
        rwidth = max(1, min(2 * n_resid // 1_000_000 + 1, sc.defaultParallelism))
        rsym, rsym_ids = tracked_checkpoint(
            resid.unionByName(resid.select(F.col("v").alias("u"), F.col("u").alias("v"))),
            rwidth,
        )
        labels, held = tracked_checkpoint(
            rsym.select(F.col("u").alias("node")).distinct()
            .withColumn("comp", F.col("node"))
        )
        labels_bytes = labels.count() * 48

        def propagate(cur: DataFrame) -> DataFrame:
            neighbor_labels = rsym.join(
                size_hinted(cur, labels_bytes), rsym.v == cur["node"]
            ).select(F.col("u").alias("node"), F.col("comp"))
            return (
                neighbor_labels.unionByName(cur)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
            )

        # TWO propagation steps per materialization round: the driver-
        # side barriers (checkpoint job + convergence collect) dominate
        # each round's wall time on shallow graphs, so halving the
        # barrier count beats minimizing per-step join work.
        # Convergence check exploits monotonicity — min-labels only
        # ever decrease — so labels changed iff sum(comp) decreased:
        # one cheap aggregate on the checkpointed result, and a sum
        # unchanged across a 2-step round implies neither step moved.
        prev_sum = None
        for _ in range(max(1, (max_iter + 1) // 2)):
            # localCheckpoint TRUNCATES the lineage — persist alone
            # caches data but Catalyst still re-analyzes the ever-
            # deepening plan each round (measured: per-iteration time
            # grows 2s → 20s by round 3 without this). Eager, so the
            # old round can be freed right away.
            new_labels, new_held = tracked_checkpoint(propagate(propagate(labels)))
            # decimal sum: node ids are longs, so an int64 sum could
            # overflow under ANSI mode on a billion-node graph
            cur_sum = new_labels.agg(
                F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
            ).collect()[0][0]
            _release(sc, held)
            labels, held = new_labels, new_held
            if prev_sum is not None and cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
        _release(sc, rsym_ids)

    # compose: node → star label → residual component (stars whose
    # label never reached the residual ARE their component's min)
    if n_resid == 0:
        final = part.select("node", F.col("lbl").alias("comp"))
    else:
        final = part.join(
            size_hinted(labels.select(F.col("node").alias("lbl"), "comp"),
                        labels_bytes),
            "lbl", "left",
        ).select("node", F.coalesce("comp", "lbl").alias("comp"))
    final, _final_ids = tracked_checkpoint(final)
    _release(sc, sym_ids | part_ids | resid_ids | held)
    if not converged:
        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; returned labels are a partial propagation",
            RuntimeWarning,
            stacklevel=2,
        )
    # the final labels checkpoint stays alive for the caller; the
    # ContextCleaner reclaims it once the frame goes out of scope
    return final


def dedup_groups(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    memo: bool = True,
) -> DataFrame:
    """Full dedup grouping: every doc gets a group id (= min doc id of
    its near-dup component; singletons are their own group), plus the
    keep/drop decision.

    The label table is one row per near-dup NODE — corpus-bounded and
    usually tiny next to ``all_ids`` — so the final left join broadcasts
    it (runtime-measured: the count is a cached-RDD read) and the full
    id table never shuffles. Past the cap the join degrades to shuffle.

    The CC label table is session-memoized on the pairs frame (same
    store as the dedup build — ``operators.dedup.DEDUP_MEMO`` — so one
    clear() resets the whole family): ``dedup_clusters`` and
    ``llm_data_pipeline`` derive labels from the identical memoized
    pair set, and the O(diameter) barrier loop should run once per
    session, not once per caller."""
    if memo:
        from ..plans.memo import frame_key
        from .dedup import DEDUP_MEMO

        # connected_components returns an eagerly checkpointed frame —
        # already materialized, stored as-is
        comps = DEDUP_MEMO.get_or_build(
            ("cc_labels", frame_key(pairs)), lambda: connected_components(pairs)
        )
    else:
        comps = connected_components(pairs)
    comps_bytes = comps.count() * 48  # cheap: comps is checkpointed
    out = (
        all_ids.select(F.col(id_col))
        .join(size_hinted(comps, comps_bytes), all_ids[id_col] == comps.node, "left")
        .select(
            id_col,
            F.coalesce(F.col("comp"), F.col(id_col)).alias("group_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("group_id"))
    )
    return out
