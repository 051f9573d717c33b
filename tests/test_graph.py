"""Semantic invariants for the graph family (co-purchase pairs,
fixed-point PageRank) plus the round-5 additions (SemDeDup,
train/val/test split, OHLC bars) — properties the DuckDB oracle's
value-hash cannot articulate."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_spark.operators.similarity import semdedup
from df_spark.queries import load_registry

REG = load_registry()


def test_copurchase_pairs_canonical_and_positive(spark, sf_dir):
    rows = REG["copurchase_pairs"].fn(spark, sf_dir).collect()
    assert rows, "expected at least one co-purchase pair"
    for r in rows:
        assert r.part_a < r.part_b  # canonical orientation, no self-pairs
        assert r.n_orders >= 1
    counts = [r.n_orders for r in rows]
    assert counts == sorted(counts, reverse=True)  # top-k ordering


def test_pagerank_mass_conservation_bounds(spark, sf_dir):
    """Every node's rank is >= teleport, and total rank mass stays
    within [0.85^t-damped lower bound, initial mass]: floor division
    only ever LOSES mass vs the real-valued recurrence, and teleport
    restores 0.15 per node per round."""
    out = REG["pagerank_parts"].fn(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r.pr >= 150_000  # teleport floor
    ranks = [r.pr for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_pagerank_deterministic_across_partitionings(spark, sf_dir):
    a = {(r.part, r.pr) for r in REG["pagerank_parts"].fn(spark, sf_dir).collect()}
    b = {
        (r.part, r.pr)
        for r in REG["pagerank_parts"].fn(spark, sf_dir)
        .repartition(7)
        .collect()
    }
    assert a == b  # integer arithmetic: partitioning cannot change values


def test_semdedup_keeps_min_id_per_similar_group(spark, sf_dir):
    """keep=0 rows must have a smaller-id tau-similar same-cell
    neighbor; the smallest id in every cell is always kept."""
    out = REG["semdedup"].fn(spark, sf_dir)
    rows = out.collect()
    assert {r.keep for r in rows} <= {0, 1}
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    for members in by_cell.values():
        lowest = min(members, key=lambda r: r.vec_id)
        assert lowest.keep == 1  # nothing can dominate the min id


def test_semdedup_tau_monotone(spark, sf_dir):
    """Raising tau can only increase the number of keepers."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    loose = semdedup(emb, n_cells=8, tau=0.2)
    strict = semdedup(emb, n_cells=8, tau=0.9)
    kept_loose = loose.filter(F.col("keep") == 1).count()
    kept_strict = strict.filter(F.col("keep") == 1).count()
    assert kept_strict >= kept_loose
    assert loose.count() == strict.count() == emb.count()  # audit table: all rows


def test_train_val_split_partitions_the_corpus(spark, sf_dir):
    out = REG["train_val_split"].fn(spark, sf_dir)
    rows = out.collect()
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"}
    total = sum(r.n_docs for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == docs  # every doc in exactly one split
    n_train = sum(r.n_docs for r in rows if r.split == "train")
    assert n_train / total > 0.8  # ~90% by construction


def test_ohlc_bars_invariants(spark, sf_dir):
    rows = REG["ohlc_bars"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1
        if r.n_events == 1:
            assert r.open == r.close == r.high == r.low


def test_triangle_counts_match_bruteforce(spark, sf_dir):
    """Degree-ordered enumeration must equal a brute-force itertools
    count on the (small) test graph — algorithm independence is the
    whole point of the oracle, so pin it in-process too."""
    from itertools import combinations

    from pyspark.sql import functions as F2

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F2.year("o_orderdate") == 1995
    )
    li = li.join(
        orders.select(F2.col("o_orderkey").alias("l_orderkey")), "l_orderkey"
    )
    op = li.select("l_orderkey", "l_partkey").distinct().collect()
    by_order: dict[int, set] = {}
    for r in op:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        for x, y in combinations(sorted(parts), 2):
            edges.add((x, y))
    adj: dict[int, set] = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    expected: dict[int, int] = {}
    for x, y in edges:
        for z in adj[x] & adj[y]:
            if z > y:  # x < y < z: count each triangle once
                for node in (x, y, z):
                    expected[node] = expected.get(node, 0) + 1
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [
        (r.part, r.n_triangles)
        for r in REG["triangle_counts"].fn(spark, sf_dir).collect()
    ]
    assert got == top


def test_knn_classify_confusion_matrix_totals(spark, sf_dir):
    """Confusion-matrix cells sum to the corpus size; predictions beat
    uniform-random accuracy on the clustered synthetic labels."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    total = emb.count()
    n_labels = emb.select("label").distinct().count()
    rows = REG["knn_classify"].fn(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == total
    classified = [r for r in rows if r.predicted is not None]
    hits = sum(r.n for r in classified if r.label == r.predicted)
    covered = sum(r.n for r in classified)
    if covered:
        assert hits / covered > 1.0 / n_labels  # better than chance
