"""Semantic invariants for the recursive-hierarchy family (pointer-
doubling tree depths) beyond the recursive-CTE oracle's value hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_spark.queries import load_registry
from df_spark.sources.tables import load_sdf


def test_tree_depths_cover_every_node_once(spark, sf_dir):
    out = load_registry()["tree_depths"].fn(spark, sf_dir)
    rows = out.collect()
    n_cust = load_sdf(spark, sf_dir, "customer").count()
    assert len(rows) == n_cust
    assert len({r.custkey for r in rows}) == n_cust
    depths = {r.custkey: r.depth for r in rows}
    assert depths[0] == 0
    assert all(d >= 1 for k, d in depths.items() if k >= 1)


def test_tree_depths_parent_recurrence_spotcheck(spark, sf_dir):
    """depth(k) == depth(parent(k)) + 1 — checked exhaustively in
    Python against the same h32 parent function."""
    import hashlib

    rows = load_registry()["tree_depths"].fn(spark, sf_dir).collect()
    depths = {r.custkey: r.depth for r in rows}

    def parent(k: int) -> int:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        return h % k

    for k, d in depths.items():
        if k >= 1:
            assert d == depths[parent(k)] + 1, k
