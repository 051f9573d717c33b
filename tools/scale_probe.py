"""Scale probe: runs flagship operators at ~1× and ~10× sf0.1 (the 10×
corpus is synthesized in-memory by unioning id-shifted copies — no
files written) and prints per-op times plus the scaling exponent
log10(t10/t1). An exponent near 1.0 = linear scaling (shuffle-bound ops
should sit slightly above 1 from the n·log n sort terms; anything ≥1.5
indicates a quadratic term that would not survive 1000×).

Usage: python tools/scale_probe.py [copies]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from df_spark.session import get_spark  # noqa: E402
from df_spark.operators import dedup as D  # noqa: E402
from df_spark.operators import similarity as S  # noqa: E402
from df_spark.sources.tables import load_sdf  # noqa: E402


def replicate(
    df: DataFrame, id_col: str, copies: int, stride: int,
    perturb_text: bool = False, prefix: bool = False,
) -> DataFrame:
    """Union id-shifted copies. ``perturb_text`` appends the copy index
    to the text so replicas are NOT near-duplicates of each other —
    otherwise every doc gains (copies-1) planted near-dups and the
    pair-output of dedup ops grows quadratically BY CONSTRUCTION (the
    output really is that big), which measures the data, not the
    algorithm. ``prefix`` PREPENDS the perturbation instead: the
    media/audio fingerprints hash the text's HEAD (fixed image size /
    leading windows), so a suffix perturb would leave replicas
    fingerprint-identical — planted near-dups by construction again."""
    out = None
    for i in range(copies):
        part = df.withColumn(id_col, F.col(id_col) + F.lit(i * stride))
        if perturb_text and i > 0:
            pert = F.lit(f" variant{i} " * 8)
            part = part.withColumn(
                "text",
                F.concat(pert, F.col("text")) if prefix
                else F.concat(F.col("text"), pert),
            )
        out = part if out is None else out.unionByName(part)
    return out


def timed(label: str, df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"  {label}: {dt:.2f}s")
    return dt


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale_probe", short_lived=True)
    sfd = "/root/testdata/sf0.1"

    li1 = load_sdf(spark, sfd, "lineitem")
    docs1 = load_sdf(spark, sfd, "documents")
    emb1 = load_sdf(spark, sfd, "embeddings")
    liN = replicate(li1, "l_orderkey", copies, 10_000_000)
    docsN = replicate(docs1, "doc_id", copies, 10_000_000, perturb_text=True)
    embN = replicate(emb1, "vec_id", copies, 10_000_000)
    print(f"rows 1x: lineitem={li1.count():,} docs={docs1.count():,} emb={emb1.count():,}")
    print(f"rows {copies}x: lineitem={liN.count():,} docs={docsN.count():,} emb={embN.count():,}")

    def q1(li: DataFrame) -> DataFrame:
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")).alias("sd"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    results: dict[str, tuple[float, float]] = {}

    def probe(name: str, f1: DataFrame, fN: DataFrame) -> None:
        print(f"{name}:")
        t1 = timed("1x", f1)
        tN = timed(f"{copies}x", fN)
        results[name] = (t1, tN)

    # warm up the Python UDF workers so the first pandas-UDF probe
    # doesn't pay worker-spawn cost
    S.ann_multi_lsh_topk(emb1.limit(50), emb1.limit(5)).write.format("noop").mode("overwrite").save()

    probe("q1_agg", q1(li1), q1(liN))
    probe("minhash_signatures", D.minhash_signatures(docs1), D.minhash_signatures(docsN))
    probe(
        "ann_multi_lsh",
        S.ann_multi_lsh_topk(emb1, emb1.filter(F.col("vec_id") < 5)),
        S.ann_multi_lsh_topk(embN, embN.filter(F.col("vec_id") < 5)),
    )
    probe("exact_dedup", D.exact_dedup_stats(docs1), D.exact_dedup_stats(docsN))
    # r12 multimodal dedup: replicas are PREFIX-perturbed (the
    # perceptual/audio fingerprints hash the text's head — a suffix
    # perturb would plant fingerprint-identical near-dups and the pair
    # output would grow quadratically by construction). Cost should be
    # the fused decode+hash scan (linear) + the band equi-join.
    docsP = replicate(
        docs1, "doc_id", copies, 10_000_000, perturb_text=True, prefix=True)
    from df_spark.multimodal import (  # noqa: E402
        bmp_perceptual_hashes,
        documents_as_bmp,
        documents_as_wav,
        wav_window_energy,
    )

    probe(
        "media_phash",
        bmp_perceptual_hashes(documents_as_bmp(docs1)),
        bmp_perceptual_hashes(documents_as_bmp(docsP)),
    )
    probe(
        "audio_energy",
        wav_window_energy(documents_as_wav(docs1), window=10),
        wav_window_energy(documents_as_wav(docsP), window=10),
    )
    # r12 video keyframe dedup: prefix perturbation shifts every frame
    # boundary, so replicas share no frames with their base — the probe
    # measures the frame hash scan + df-capped inverted self-join, not
    # planted containment pairs
    from df_spark.multimodal import documents_as_media, frame_sample  # noqa: E402

    def vfd(docs_frame: DataFrame) -> DataFrame:
        frames = (
            frame_sample(documents_as_media(docs_frame), every_n_bytes=64)
            .select("media_id", F.md5("frame_bytes").alias("fh"))
        )
        dfq = frames.groupBy("fh").agg(
            F.count_distinct("media_id").alias("d"))
        rare = frames.join(dfq.filter(F.col("d") <= 20).select("fh"), "fh")
        return (
            rare.select(F.col("media_id").alias("id_a"), "fh")
            .join(rare.select(F.col("media_id").alias("id_b"), "fh"), "fh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count_distinct("fh").alias("n_shared"))
        )

    probe("video_frame_join", vfd(docs1), vfd(docsP))
    # r12 incremental crawl-vs-index maintenance: suffix-perturbed
    # replicas (minhash shingle domain); the probe guards the
    # batch-vs-index band join's fan-out
    probe(
        "dedup_incremental",
        D.incremental_band_dedup(docs1, 0.6, memo=False),
        D.incremental_band_dedup(docsN, 0.6, memo=False),
    )
    # r9 repetition signals: two explode->hash-agg passes keyed by
    # (doc_id, gram) — map-side combine should keep this linear
    from df_spark.queries.text import ngram_repetition_stats  # noqa: E402

    probe(
        "ngram_repetition",
        ngram_repetition_stats(docs1),
        ngram_repetition_stats(docsN),
    )
    # r10 boilerplate gate: (source, segment) agg + exchange-reused
    # probe join + doc re-agg — the probe guards the join fan-out
    # (replicas share their base doc's segments, so segment document
    # frequencies GROW with copies; linearity depends on the map-side
    # combine absorbing the repeated keys)
    from df_spark.queries.text import boilerplate_segment_stats  # noqa: E402

    probe(
        "boilerplate_segments",
        boilerplate_segment_stats(docs1),
        boilerplate_segment_stats(docsN),
    )
    # banded n-gram Jaccard (round 6): the band in the block key is what
    # keeps block sizes corpus-invariant — replicas are text-perturbed,
    # so they land in different band buckets and the pair join scales
    # with true near-dup volume, not block population squared (the r5
    # lang×len_bucket-only blocking measured ~quadratic here)
    # r11 exact-substring election: ~20x explode -> ONE hash(span)
    # exchange carrying three window passes -> doc_id reassembly agg.
    # The election key is the span text (uniform); the probe guards
    # that the window passes stay linear in the span stream (replicas
    # are perturbed, so shared spans grow only via the common prefix
    # of each base doc — sublinear duplicate mass)
    from df_spark.queries.dedup import dup_span_frame  # noqa: E402

    probe(
        "dup_span_election",
        dup_span_frame(docs1),
        dup_span_frame(docsN),
    )
    blocks = {"lang": F.col("lang"), "len_bucket": F.expr("n_chars div 100")}
    probe(
        "ngram_jaccard_banded",
        D.banded_ngram_jaccard(docs1, blocks),
        D.banded_ngram_jaccard(docsN, blocks),
    )
    # prefix-filtered exact similarity join: its scale variable is the
    # CANDIDATE count. Since r8 the candidate key carries a MinHash
    # band conjunct, so the junk term (prefix collisions on the closed
    # vocabulary — 85k at 1x / 9.2M at 10x in r7) is gone and the
    # candidate set is OUTPUT-bound: junk = candidates - true output
    # pairs is the algorithmic overhead, and the output itself grows
    # with planted near-dup density (each perturbed replica is a true
    # J>=0.7 match of its base doc — 45 true pairs per base at 10x,
    # which any EXACT join must emit).
    print("prefix_sim_join (output-bound candidates since r8):")
    for label, docs in [("1x", docs1), (f"{copies}x", docsN)]:
        # time the WHOLE candidate build: prefix_candidate_pairs
        # materializes eagerly (localCheckpoint), so starting the clock
        # after it would time a cached-RDD count, not the work
        t0 = time.time()
        _, _, cand = D.prefix_candidate_pairs(docs, 0.7, partition_cols=["source"])
        n = cand.count()
        dt = time.time() - t0
        n_out = D.prefix_filtered_pairs(docs, 0.7, partition_cols=["source"]).count()
        print(
            f"  {label}: {n:,} candidates in {dt:.2f}s -> {n / dt:,.0f} cand/s"
            f" | output {n_out:,} true pairs, junk {n - n_out:,}"
            f" (cand/output {n / max(n_out, 1):.2f}x)"
        )

    # release the dedup family's checkpoint storage before the graph
    # probes: at 10x the memoized builds/pair sets hold GBs of block-
    # manager storage, and waiting on the ContextCleaner lets that
    # pressure (GC + eviction) bleed into the pagerank/triangle
    # timings (r8: observed 10x rows 2-3x slower without this). Safe
    # here because no live plan spans the family boundary.
    D.DEDUP_MEMO.clear()
    reg = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(reg.keySet()):
        jrdd = reg.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)

    # LSH candidates are OUTPUT-bound on this corpus: the synthetic
    # vocabulary is ~30 words, so random doc pairs have Jaccard ~0.3-0.5
    # and the candidate-pair count itself grows ~quadratically — that's
    # the data's true near-dup structure, not an algorithmic term. The
    # honest throughput metric is emitted pairs/sec.
    # graph family: shift BOTH l_orderkey and l_partkey per copy so
    # every replica contributes a disjoint component — the graph itself
    # grows by `copies`, which is the honest scale variable for
    # PageRank (per-iteration join+agg over edges) and degree-ordered
    # triangles (wedge join bounded by E^1.5)
    from df_spark.queries.graph_q import (  # noqa: E402
        order_parts,
        pagerank_from_order_parts,
        triangles_from_order_parts,
    )

    liG = None
    for i in range(copies):
        part = li1.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000)
        ).withColumn("l_partkey", F.col("l_partkey") + F.lit(i * 10_000_000))
        liG = part if liG is None else liG.unionByName(part)
    probe(
        "pagerank",
        pagerank_from_order_parts(order_parts(li1)),
        pagerank_from_order_parts(order_parts(liG)),
    )
    probe(
        "triangles",
        triangles_from_order_parts(order_parts(li1)),
        triangles_from_order_parts(order_parts(liG)),
    )

    # symmetric release: drop the graph family's memoized edge tables
    # before timing the LSH rebuild
    from df_spark.queries.graph_q import GRAPH_MEMO  # noqa: E402

    GRAPH_MEMO.clear()
    reg = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(reg.keySet()):
        jrdd = reg.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)

    print("lsh_pairs (output-bound):")
    for label, docs in [("1x", docs1), (f"{copies}x", docsN)]:
        # clock starts BEFORE the build: lsh_candidate_pairs
        # materializes eagerly (localCheckpoint), so timing only the
        # count afterwards measures a cached-RDD scan, not the work
        # (the memo was cleared above, so this is a cold build)
        t0 = time.time()
        pairs = D.lsh_candidate_pairs(D.minhash_signatures(docs))
        n = pairs.count()
        dt = time.time() - t0
        print(f"  {label}: {n:,} pairs in {dt:.2f}s -> {n / dt:,.0f} pairs/s")

    print("\nscaling exponents (1.0 = linear):")
    for name, (t1, tN) in results.items():
        exp = math.log(tN / t1) / math.log(copies) if t1 > 0 else float("nan")
        print(f"  {name}: {exp:.2f}  ({t1:.2f}s -> {tN:.2f}s at {copies}x)")


if __name__ == "__main__":
    main()
