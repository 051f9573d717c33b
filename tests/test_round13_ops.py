"""Semantic tests for the round-13 operators (beyond the smoke run and
the DuckDB oracle): each pins a property a silent bug would break
without changing row counts."""

from __future__ import annotations

import collections

from df_spark.queries import load_registry
from df_spark.sources.tables import load_sdf

REG = load_registry()


# --------------------------------------------------------------------
# ann_incremental: new-generation assignment vs the persisted codebook
# --------------------------------------------------------------------

def test_ann_incremental_assignment_is_argmin(spark, sf_dir):
    """Every emitted (code, sse_e4) must be the argmin over ALL codes
    of the integer-scaled distance recomputed independently from the
    engine's trained codebook and the 6-decimal points — a wrong
    tie-break, a stale codebook, or a dropped code would fail here."""
    from df_spark.queries.similarity import (
        _PQ_K, _pq_pts, _pq_train_inc)

    cent = _pq_train_inc(spark, sf_dir)
    pts = collections.defaultdict(dict)  # (vec, sub) -> {j: x}
    for r in _pq_pts(spark, sf_dir).collect():
        pts[(r["vec_id"], r["sub"])][r["j"]] = r["x"]
    out = REG["ann_incremental"].fn(spark, sf_dir).collect()
    assert out
    checked = 0
    for row in out:
        if row["vec_id"] % 7:  # deterministic sample, keep the test fast
            continue
        coords = pts[(row["vec_id"], row["sub_id"])]
        dists = []
        for code in range(_PQ_K):
            d = sum(
                int(round((x - cent[(row["sub_id"], code, j)]) ** 2 * 1e4))
                for j, x in coords.items()
            )
            dists.append((d, code))
        best = min(dists)
        assert (row["sse_e4"], row["code"]) == best, row
        checked += 1
    assert checked > 50


def test_ann_incremental_covers_exactly_new_generations(spark, sf_dir):
    from pyspark.sql import functions as F

    from df_spark.queries.similarity import _INC_GENS, _PQ_M

    emb = load_sdf(spark, sf_dir, "embeddings")
    new_ids = {
        r["vec_id"]
        for r in emb.filter((F.col("vec_id") % _INC_GENS) != 0)
        .select("vec_id").collect()
    }
    out = REG["ann_incremental"].fn(spark, sf_dir).collect()
    got = collections.Counter(r["vec_id"] for r in out)
    assert set(got) == new_ids
    # every new vector gets exactly one code per subspace
    assert set(got.values()) == {_PQ_M}
    assert all(r["gen"] == r["vec_id"] % _INC_GENS for r in out)
    assert all(r["gen"] != 0 for r in out)


def test_ann_drift_audit_internally_consistent(spark, sf_dir):
    """recall_permille, n_overlap, and mean_sse_e4 must all be
    consistent with each other and with ann_incremental's rows."""
    from df_spark.queries.similarity import _ADC_K, _ADC_QUERIES, _INC_GENS

    rows = REG["ann_drift_audit"].fn(spark, sf_dir).collect()
    assert len(rows) == _ADC_QUERIES * (_INC_GENS - 1)
    inc = REG["ann_incremental"].fn(spark, sf_dir).collect()
    per_gen_sum = collections.Counter()
    per_gen_n = collections.Counter()
    for r in inc:
        per_gen_sum[r["gen"]] += r["sse_e4"]
        per_gen_n[r["gen"]] += 1
    for r in rows:
        assert r["n_exact"] == _ADC_K
        assert 0 <= r["n_overlap"] <= r["n_exact"]
        assert r["recall_permille"] == (1000 * r["n_overlap"]) // _ADC_K
        assert r["mean_sse_e4"] == per_gen_sum[r["gen"]] // per_gen_n[r["gen"]]
    # the compressed index must be doing real retrieval work: average
    # recall across (gen, query) cells is far above the random-overlap
    # floor (k/n ~ 2% at this corpus size)
    avg = sum(r["recall_permille"] for r in rows) / len(rows)
    assert avg >= 200, avg


def test_inc_codebook_is_gen0_only(spark, sf_dir):
    """The persisted codebook must be derivable from generation 0
    alone: training again on a frame where every NEW-generation text is
    replaced by zeros must give the identical codebook (a leak of new
    vectors into training would shift some centroid)."""
    from pyspark.sql import functions as F

    from df_spark.queries.similarity import (
        _INC_GENS, _PQ_K, _lloyd_train, _pq_pts, _pq_train_inc)

    cent = _pq_train_inc(spark, sf_dir)
    pts0 = _pq_pts(spark, sf_dir).filter(
        (F.col("vec_id") % _INC_GENS) == 0)
    emb = load_sdf(spark, sf_dir, "embeddings")
    ids = [
        r["vec_id"]
        for r in emb.filter((F.col("vec_id") % _INC_GENS) == 0)
        .select("vec_id").orderBy("vec_id").limit(_PQ_K).collect()
    ]
    assert _lloyd_train(spark, pts0, ids) == cent
