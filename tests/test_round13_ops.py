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
    alone: re-running the shared Lloyd loop on the gen-0-filtered
    points (new generations absent entirely) must give the identical
    codebook (a leak of new vectors into training would shift some
    centroid)."""
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


# --------------------------------------------------------------------
# multimodal_dedup_report: cross-modality election
# --------------------------------------------------------------------

def test_multimodal_report_matches_pair_sets(spark, sf_dir):
    """The election must agree edge-for-edge with the four modality
    pair queries it unions: drop iff a smaller partner exists in ANY
    modality, reason = highest-precedence flagging modality,
    n_dup_edges/n_modalities/first_partner recomputed independently."""
    import collections

    from pyspark.sql import functions as F

    from df_spark.operators import dedup as D
    from df_spark.sources.tables import load_sdf

    docs = load_sdf(spark, sf_dir, "documents")
    pair_sets = {
        "text": D.minhash_near_dups(docs, min_jaccard=0.6),
        "image": REG["media_near_dup"].fn(spark, sf_dir),
        "audio": REG["audio_fp_near_dup"].fn(spark, sf_dir),
        "video": REG["video_frame_dedup"].fn(spark, sf_dir),
    }
    prec = {"text": 0, "image": 1, "audio": 2, "video": 3}
    edges = collections.defaultdict(list)  # doc -> [(partner, prec)]
    n_pairs = 0
    for mod, df in pair_sets.items():
        for r in df.select("id_a", "id_b").collect():
            edges[r["id_a"]].append((r["id_b"], prec[mod]))
            edges[r["id_b"]].append((r["id_a"], prec[mod]))
            assert r["id_a"] < r["id_b"], (mod, r)
            n_pairs += 1
    assert n_pairs > 0
    name_of = {v: k for k, v in prec.items()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    out = {r["doc_id"]: r
           for r in REG["multimodal_dedup_report"].fn(spark, sf_dir).collect()}
    assert set(out) == all_ids
    n_drop = 0
    for doc, row in out.items():
        inc = edges.get(doc, [])
        smaller = [(pp, p) for (pp, p) in inc if pp < doc]
        if smaller:
            n_drop += 1
            assert row["action"] == "drop"
            assert row["reason"] == name_of[min(p for _pp, p in smaller)]
            assert row["first_partner"] == min(pp for pp, _p in smaller)
        else:
            assert row["action"] == "retain"
            assert row["reason"] == ("canonical" if inc else "unique")
            assert row["first_partner"] is None
        assert row["n_dup_edges"] == len(inc)
        assert row["n_modalities"] == len({p for _pp, p in inc})
    assert 0 < n_drop < len(all_ids)


def test_multimodal_report_shares_memoized_builds(spark, sf_dir):
    """After the modality queries run once, the rollup must not create
    new MEDIA_MEMO / near-dup entries (zero new corpus scans)."""
    from df_spark.operators.dedup import DEDUP_MEMO
    from df_spark.queries.multimodal import MEDIA_MEMO

    for q in ("media_near_dup", "audio_fp_near_dup", "video_frame_dedup"):
        REG[q].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    REG["minhash_near_dups"].fn(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    media_keys = set(MEDIA_MEMO._entries)
    dedup_keys = set(DEDUP_MEMO._entries)
    REG["multimodal_dedup_report"].fn(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    assert set(MEDIA_MEMO._entries) == media_keys
    assert set(DEDUP_MEMO._entries) == dedup_keys


# --------------------------------------------------------------------
# perceptual_hash_bands: integer box-filter resampler (arbitrary sizes)
# --------------------------------------------------------------------

def _rand_rows(w, h, seed):
    """Deterministic pseudo-random RGB grid (no random module: keeps
    the fixture reproducible in the test log)."""
    return [
        [((x * 31 + y * 17 + seed) % 256,
          (x * 7 + y * 13 + 2 * seed) % 256,
          (x * 3 + y * 29 + 3 * seed) % 256) for x in range(w)]
        for y in range(h)
    ]


def test_phash_fast_path_scale_invariant():
    """Exact pixel-doubling (an area-preserving transform) must leave
    every band bit unchanged on the integral fast path: all bit rules
    compare cells within one image, and uniform scaling cannot flip a
    comparison."""
    from df_spark.multimodal import perceptual_hash_bands

    rows = _rand_rows(18, 16, seed=5)
    d0, a0 = perceptual_hash_bands(18, 16, rows)
    rows2 = [[px for px in r for _ in range(2)] for r in rows for _ in range(2)]
    d2, a2 = perceptual_hash_bands(36, 32, rows2)
    assert (d2, a2) == (d0, a0)


def test_phash_general_path_agrees_with_fast_path():
    """Cross-path exactness proof for the area-weighted resampler:
    15x8 takes the GENERAL path (15 % 9 != 0) while its exact
    3x-pixel-replication 45x24 takes the integral FAST path (45 = 9*5,
    24 = 8*3) over identical image content — any rounding or
    mis-weighted overlap in the general path flips a bit here. 20x20
    (non-integral on both axes) additionally smoke-tests pure
    general-path hashing."""
    from df_spark.multimodal import perceptual_hash_bands

    d, a = perceptual_hash_bands(20, 20, _rand_rows(20, 20, seed=9))
    assert all(0 <= b < (1 << 16) for b in d + a)
    rows = _rand_rows(15, 8, seed=11)
    d0, a0 = perceptual_hash_bands(15, 8, rows)
    rows3 = [[px for px in r for _ in range(3)] for r in rows for _ in range(3)]
    d3, a3 = perceptual_hash_bands(45, 24, rows3)
    assert (d3, a3) == (d0, a0)


def test_phash_too_small_raises():
    import pytest

    from df_spark.multimodal import perceptual_hash_bands

    with pytest.raises(NotImplementedError):
        perceptual_hash_bands(8, 8, _rand_rows(8, 8, seed=1))


def test_phash_real_bmp_roundtrip_nonintegral(spark):
    """End-to-end through the REAL BMP container at a non-grid size:
    encode a 20x12 BMP, decode, hash — the full codec chain must
    serve arbitrary dimensions now."""
    from df_spark.multimodal import (
        _decode_bmp_pixels, _encode_bmp, perceptual_hash_bands)

    rows = _rand_rows(20, 12, seed=3)
    payload = _encode_bmp(20, 12, rows)
    w, h, got = _decode_bmp_pixels(payload)
    assert (w, h) == (20, 12) and got == rows
    d, a = perceptual_hash_bands(w, h, got)
    assert len(d) == len(a) == 4
