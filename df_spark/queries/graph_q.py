"""Graph analytics over the co-purchase graph (parts linked by
appearing in the same order) — market-basket pair mining and a
fixed-point-integer PageRank.

The reference engine has no graph surface at all (its API stops at the
relational core, ``src/api.rs``); these queries extend the engine the
same way ``operators/clustering.py`` does for connected components:
the DATA stays distributed (each PageRank iteration is one hash join +
one aggregate), only bounded scalars ever reach the driver, and the
iteration count is a fixed constant — so the whole thing is a chain of
ordinary shuffles that AQE sizes at any scale.

Determinism policy: PageRank's usual double arithmetic is summation-
order-dependent, so ranks here are *fixed-point integers* (SCALE=1e6)
and every contribution uses BIGINT floor division (``div`` in Spark,
``//`` in DuckDB) — associative integer sums, bit-exact on any engine
and any partitioning. Overflow headroom: rank mass is bounded by
N·SCALE, so rank·85 stays under 2^63 for N up to ~1e11 nodes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.memo import FrameMemo, frame_key
from ..sources.tables import load_sdf
from . import register

# Session memo for the graph family's shared intermediates (same Pool
# pattern as operators.dedup.DEDUP_MEMO): the distinct (order, part)
# incidence list feeds copurchase_pairs AND pagerank_parts, and the
# dense co-purchase edge list + degree table are pagerank's dominant
# cost. bench.py clears this per pass alongside the dedup memo so
# medians keep cold-session semantics.
GRAPH_MEMO = FrameMemo(capacity=4)

_TOP_PAIRS = 100
_PR_SCALE = 1_000_000  # fixed-point: rank 1.0 == 1e6
_PR_TELEPORT = 150_000  # 0.15 * SCALE
_PR_ITERS = 3
_PR_TOP = 50

_EDGES_SQL = """
    op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    )
"""


def order_parts(li):
    """Distinct (order, part) pairs — the bipartite incidence list the
    co-purchase graph is built from. DISTINCT first: an order with the
    same part on two lines must contribute the pair once."""
    return li.select("l_orderkey", "l_partkey").distinct()


def _order_parts(spark, sf_dir):
    li = load_sdf(spark, sf_dir, "lineitem")
    return GRAPH_MEMO.get_or_build(
        ("order_parts", frame_key(li)),
        lambda: order_parts(li).localCheckpoint(eager=True),
    )


@register(
    "copurchase_pairs",
    sql=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_orders
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders FROM (
      SELECT part_a, part_b, n_orders,
             ROW_NUMBER() OVER (ORDER BY n_orders DESC, part_a, part_b) AS rn
      FROM pairs
    ) WHERE rn <= {_TOP_PAIRS}
    """,
)
def copurchase_pairs(spark, sf_dir):
    """Market-basket pair mining: the ``_TOP_PAIRS`` most frequent part
    pairs bought in the same order.

    Scale: the self-join is keyed on l_orderkey, and lines-per-order is
    bounded (TPC-H caps at 7), so pair fan-out is ≤ C(7,2)=21 per order
    — LINEAR in orders, never quadratic in parts. One shuffle on
    orderkey, one hash agg on the pair key, then TakeOrderedAndProject
    (no global sort) for the top slice."""
    op = _order_parts(spark, sf_dir)
    a = op.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return pairs.orderBy(
        F.desc("n_orders"), "part_a", "part_b"
    ).limit(_TOP_PAIRS)


def _pagerank_iter_sql() -> str:
    """Unrolled fixed-iteration CTE chain r1..r{_PR_ITERS}."""
    ctes = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        ctes.append(f"""
    r{i}_raw AS (
      -- CAST back to BIGINT each iteration: DuckDB widens SUM(BIGINT)
      -- to HUGEINT, which would otherwise propagate through every CTE
      -- into the output column and hash differently across driver
      -- environments (r5 driver hash-fail root cause)
      SELECT e.v AS node,
             CAST({_PR_TELEPORT}
                  + SUM((r.rank * 85) // (100 * r.outdeg)) AS BIGINT) AS rank
      FROM edges e JOIN {prev} r ON e.u = r.node
      GROUP BY e.v
    ),
    r{i} AS (
      SELECT x.node, d.outdeg, x.rank
      FROM r{i}_raw x JOIN deg d ON x.node = d.u
    )""")
        prev = f"r{i}"
    return ",".join(ctes)


@register(
    "pagerank_parts",
    sql=f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT u, COUNT(*) AS outdeg FROM edges GROUP BY u),
    r0 AS (SELECT u AS node, outdeg,
                  CAST({_PR_SCALE} AS BIGINT) AS rank FROM deg),
    {_pagerank_iter_sql()}
    SELECT node AS part, CAST(rank AS BIGINT) AS pr FROM (
      SELECT node, rank,
             ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rn
      FROM r{_PR_ITERS}
    ) WHERE rn <= {_PR_TOP}
    """,
)
def pagerank_parts(spark, sf_dir):
    """Fixed-point-integer PageRank (``_PR_ITERS`` iterations, damping
    0.85) over the undirected co-purchase graph; top ``_PR_TOP`` hub
    parts.

    The iterative-weighted-graph twin of ``dedup_clusters``'s
    connected components: per iteration one shuffle join (ranks onto
    edges by source) + one hash aggregate (sum contributions per
    destination). The edge list is built once and localCheckpoint'd —
    without the cut each iteration would re-run
    the order-pair self-join. Iteration count is a compile-time
    constant, so plan depth is bounded and no convergence check ever
    touches the driver. All arithmetic is BIGINT (floor division via
    ``div``), so the result is bit-exact regardless of partitioning,
    engine, or summation order — the property the usual double-typed
    PageRank cannot give an oracle."""
    return pagerank_from_order_parts(_order_parts(spark, sf_dir))


def pagerank_from_order_parts(op):
    def build_edges():
        a = op.select("l_orderkey", F.col("l_partkey").alias("u"))
        b = op.select("l_orderkey", F.col("l_partkey").alias("v"))
        return (
            a.join(b, "l_orderkey")
            .filter(F.col("u") != F.col("v"))
            .select("u", "v")
            .distinct()
            .localCheckpoint(eager=True)
        )

    # the distinct dense edge list is the query's dominant cost —
    # session-memoized so reruns (and any future co-purchase-graph
    # query) skip the self-join+distinct
    edges = GRAPH_MEMO.get_or_build(
        ("pr_edges", frame_key(op)), build_edges)
    from ..operators.partitioning import size_hinted

    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    n_nodes = deg.count()
    deg = deg.localCheckpoint(eager=True)
    # the per-vertex state (node, outdeg, rank) is 24 B/row — when it
    # fits the broadcast cap each iteration becomes a map-side join
    # over the edge fact + one hash aggregate (no edge shuffle at all);
    # past the cap it degrades to the plain shuffle join on u
    state_bytes = n_nodes * 48
    state = deg.select(
        F.col("u").alias("node"),
        "outdeg",
        F.lit(_PR_SCALE).cast("long").alias("rank"),
    )
    for _ in range(_PR_ITERS):
        contrib = edges.join(
            size_hinted(state, state_bytes), edges["u"] == state["node"]
        ).select(
            F.col("v").alias("node"),
            F.expr("(rank * 85) div (100 * outdeg)").alias("c"),
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit(_PR_TELEPORT) + F.sum("c")).alias("rank")
        )
        state = ranks.join(
            size_hinted(deg.select(F.col("u").alias("node"), "outdeg"),
                        state_bytes),
            "node",
        )
    return (
        state.select(F.col("node").alias("part"), F.col("rank").alias("pr"))
        .orderBy(F.desc("pr"), "part")
        .limit(_PR_TOP)
    )


_TRI_TOP = 50
_TRI_YEAR = 1995  # one order-year of co-purchases: the full-corpus
# graph is artificially DENSE (uniform-random parts per order -> avg
# degree ~116, 41 M wedges at sf0.1), so the unscoped wedge join pays
# for the synthetic data's density, not the algorithm; real co-purchase
# graphs are power-law, which is exactly what degree ordering is for


@register(
    "triangle_counts",
    sql=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(o_orderdate) = {_TRI_YEAR}
    ),
    ce AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT ab.u AS a, ab.v AS b, bc.v AS c
      FROM ce ab
      JOIN ce bc ON ab.v = bc.u
      JOIN ce ac ON ac.u = ab.u AND ac.v = bc.v
    ),
    pernode AS (
      SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT node AS part, n_triangles FROM (
      SELECT node, n_triangles,
             ROW_NUMBER() OVER (ORDER BY n_triangles DESC, node) AS rn
      FROM pernode
    ) WHERE rn <= {_TRI_TOP}
    """,
)
def triangle_counts(spark, sf_dir):
    """Per-node triangle counts over the co-purchase graph (top
    ``_TRI_TOP`` by count) — the clustering-coefficient numerator.

    The Spark side uses DEGREE-ORDERED node iteration (Cohen's
    MapReduce triangle counting): each canonical edge is redirected
    from its lower-(degree, id)-rank endpoint to the higher, wedges
    are enumerated only at each triangle's minimum-rank vertex, and a
    final equi-join against the canonical edge list closes them. That
    bounds wedge fan-out by O(E^1.5) regardless of hub degree — the
    property that keeps the operator alive on power-law graphs at
    100 TB, where the naive a<b<c wedge join explodes quadratically at
    hubs. The DuckDB oracle USES that naive form: triangle counts are
    algorithm-independent, so the oracle pins semantics while the
    engine picks the scalable physical strategy.

    Every join is an equi-join (wedge join on the source vertex,
    closure on the undirected pair key); degree/rank tables are one
    row per vertex — broadcastable dims against the edge fact."""
    li = load_sdf(spark, sf_dir, "lineitem")
    # range predicate, not year(): the function wrapper would block
    # parquet predicate pushdown on the orders scan
    orders = load_sdf(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= f"{_TRI_YEAR}-01-01")
        & (F.col("o_orderdate") < f"{_TRI_YEAR + 1}-01-01")
    )
    scoped = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey"
    )
    return triangles_from_order_parts(order_parts(scoped))


def triangles_from_order_parts(op):
    a = op.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("v"))
    ce = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        ce.select(F.col("u").alias("node"))
        .unionAll(ce.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # redirect each edge low-rank -> high-rank; rank = (deg, id).
    # deg is one (long, long) row per vertex; measure it off the edge
    # checkpoint (no Catalyst stats) and broadcast when it fits — the
    # vertex dim against the edge fact
    from ..operators.partitioning import size_hinted

    n_nodes = deg.count()
    deg = deg.localCheckpoint(eager=True)
    deg_bytes = n_nodes * 40
    du = size_hinted(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), deg_bytes
    )
    dv = size_hinted(
        deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), deg_bytes
    )
    ranked = ce.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # materialize the ranked/redirected edge list ONCE: the wedge join
    # reads it twice and the closure a third time — without the cut
    # each reference re-runs the order-pair self-join and both degree
    # joins (probed: 37 shuffles vs 8 in the executed plan)
    directed = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).localCheckpoint(eager=True)
    # wedges centered at the min-rank vertex: two out-edges of src,
    # ordered by the endpoints' (deg, id) rank to count each wedge once
    w1 = directed.select("src", F.col("dst").alias("x"), F.col("ddst").alias("dx"))
    w2 = directed.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    # canonicalize to the undirected pair key and DROP the rank columns
    # before the closure join: past broadcast scale the wedge set (~E^1.5
    # rows, the biggest intermediate in the whole operator) goes through
    # a shuffle, and three longs per row is the minimum it can weigh
    wedges = (
        w1.join(w2, "src")
        .filter(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        )
        .select("src", F.least("x", "y").alias("cu"), F.greatest("x", "y").alias("cv"))
    )
    # close the wedge against the canonical (undirected) edge list —
    # the SMALL side (wedges ~ E^1.5 vs E edges): broadcast it while
    # its measured size fits the cap; past the cap, force a SHUFFLED
    # HASH join instead of letting the planner sort-merge. The build
    # side stays the per-partition slice of the edge list (tiny), and
    # the wedge side is never sorted — probed at 10x sf0.1: the SMJ
    # regime's 410 M-row wedge sort cost 240 s, the hash join 50 s.
    closure = size_hinted(
        ce.select(F.col("u").alias("cu"), F.col("v").alias("cv")),
        ce.count() * 48,
        fallback_hint="shuffle_hash",
    )
    tri = wedges.join(closure, ["cu", "cv"]).select(
        F.col("src").alias("a"), F.col("cu").alias("b"), F.col("cv").alias("c")
    )
    pernode = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        pernode.select(F.col("node").alias("part"), "n_triangles")
        .orderBy(F.desc("n_triangles"), "part")
        .limit(_TRI_TOP)
    )
