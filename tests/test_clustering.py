"""Connected-components / dedup-grouping tests (known graphs)."""

from __future__ import annotations

import warnings

import pytest

from df_spark.operators.clustering import connected_components, dedup_groups


def test_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 13)],
        "id_a long, id_b long")
    comps = {r.node: r.comp for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10, 13: 10}


def test_components_chain_diameter(spark):
    # a long chain stresses the iteration count (diameter = n-1)
    n = 12
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")
    comps = {r.node: r.comp for r in connected_components(edges).collect()}
    assert set(comps.values()) == {0}
    assert len(comps) == n + 1


def test_components_releases_intermediate_storage(spark):
    # each round's checkpoint must be freed: after the run, only the
    # final labels (plus anything the caller already held) may remain
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    labels = connected_components(edges)
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    assert len(after - before) <= 1  # the returned labels checkpoint
    assert labels.count() == 11


def test_components_warns_without_convergence(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_components_converged_run_does_not_warn(spark):
    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        comps = {r.node: r.comp for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1}


def test_dedup_groups_with_singletons(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 4)], "id_a long, id_b long")
    all_ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5]], "doc_id long")
    out = {r.doc_id: (r.group_id, r.keep) for r in dedup_groups(pairs, all_ids).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 4: (1, False),  # one component, keep min
        3: (3, True), 5: (5, True),                  # singletons keep themselves
    }


def test_components_match_union_find_on_random_graphs(spark):
    """Star-contraction CC must equal a reference union-find on random
    graphs of varying density — chains, cliques, singleton-heavy mixes
    all emerge from the generator. Deterministic seeds: same graphs
    every run."""
    import random

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 40, 80), (3, 25, 5), (4, 60, 60)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        # reference union-find with min-label semantics
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        expect = {x: find(x) for x in touched}

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.node: r.comp for r in connected_components(df).collect()}
        assert got == expect, f"seed {seed}: {got} != {expect}"
