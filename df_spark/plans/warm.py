"""Designated cold-build rows for the bench harness (judge r11
directive #1: pin the shared builds' first toucher).

Each entry forces ONE family's session-memoized shared build, so its
cold cost lands on a stable, explicitly named ``_build_*`` bench row
instead of whichever family member happens to run first — the r11
board showed the same HEAD attributing an 18.4 s dedup cold build to
``containment_join`` locally but a 36.8 s first touch to
``minhash_est_audit`` on the driver, making per-row cross-round deltas
unfalsifiable. With the builds pinned, every real query row measures
its WARM cost (tight spreads, comparable across rounds) and the build
rows carry the cold cost visibly.

Single-consumer builds (BPE training, PageRank's edge list, the
containment result memo) deliberately stay on their query's row: they
ARE that operator's cost, not shared state.

Drift guard: ``tests/test_warm_builds.py`` asserts that after these
builds run, the member queries hit the memos (zero new misses) — a
query changing its default args would silently un-pin its family and
fail there.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession


def _overlapped(*thunks: Callable[[], object]) -> tuple:
    """Run INDEPENDENT sub-builds of one ``_build_*`` row as
    overlapping Spark jobs (optimization-guide §2.6): Spark's scheduler
    happily runs several jobs at once inside one application — the
    sub-builds were only sequential because the driver called them
    sequentially, and each build's tail (the checkpoint's last
    straggler task, a single-partition ``toPandas``) left the other
    cores idle. FIFO scheduling backfills one build's tail with the
    next build's tasks; total CPU is unchanged, only the row's wall
    shrinks. Memo coordination is already thread-safe (per-key
    in-flight events, ``plans/memo.py``), and the callers below only
    overlap thunks with NO shared un-memoized state beyond builds that
    ran earlier in the dependency order."""
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return tuple(f.result() for f in futures)


def family_warm_builds(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, Callable[[], object]]]:
    """(bench row name, build thunk) per family shared build, in
    dependency order. Thunks materialize eagerly (the builds checkpoint
    inside) — calling them IS the work."""
    from ..operators import dedup as D
    from ..queries import graph_q as GQ
    from ..queries import multimodal as MQ
    from ..queries import similarity as SQ
    from ..queries import tokens as TQ
    from ..sources.tables import load_sdf

    docs = load_sdf(spark, sf_dir, "documents")
    return [
        # the one-aggregate MinHash profile (sets/bitmap + 16 minima):
        # shared by every minhash/SimHash-family row
        ("_build_dedup_minhash", lambda: D._shared_build(docs)),
        # banding candidates + the verified near-dup pair set: the pair
        # set is shared by dedup_clusters / llm_data_pipeline /
        # minhash_near_dups; the JVM candidate table ("cand") is shared
        # by minhash_lsh_pairs / minhash_est_audit (the fused near-dup
        # regime derives its candidates inside the numpy pass and never
        # builds it, so force it explicitly)
        ("_build_dedup_neardups",
         lambda: _overlapped(
             lambda: D.lsh_candidate_pairs(D.minhash_signatures(docs)),
             lambda: D.minhash_near_dups(docs, 0.6))),
        # xxhash shingle sets + rarity-sorted arrays: shared by
        # prefix_sim_join, containment_join (their verify stages stay
        # on their own rows)
        ("_build_dedup_rarity",
         lambda: D._rarity_build(docs, "doc_id", "text", 7, ["source"])),
        # token checkpoint + the bigram scoring frame (judge r11
        # directive #5: lm_quality_buckets' ride must not bill
        # bigram_lm_score)
        # NOT overlapped: both token sub-builds are CPU-wide per-char
        # passes — measured r13: overlap left wall flat (2.9 vs 3.0 s)
        # and cost +3 CPU-s to contention, so they stay sequential
        ("_build_tokens",
         lambda: (TQ._tokens_sdf(spark, sf_dir),
                  TQ._bigram_scored(spark, sf_dir))),
        # PQ: dim-exploded points, codebook training, final codes —
        # shared by pq_quantize, pq_adc_topk, adc_recall_audit
        ("_build_pq", lambda: SQ._pq_codes(spark, sf_dir)),
        # incremental PQ: gen-0 codebook + new-generation assignment —
        # shared by ann_incremental, ann_drift_audit (r13)
        ("_build_pq_inc", lambda: SQ._pq_codes_inc(spark, sf_dir)),
        # distinct (order, part) incidence list: the co-purchase graph
        # family's shared base
        ("_build_graph", lambda: GQ._order_parts(spark, sf_dir)),
        # modality feature frames (image phash bands, audio fingerprint
        # bands, video frame hashes) AND their verified pair sets: each
        # shared by its near-dup query AND multimodal_dedup_report
        # (r13; the pair memos stop the rollup re-running every
        # modality's band join + verify). Each _*_pairs build forces
        # its feature frame first, so one thunk per modality keeps the
        # dependency order while the three modalities overlap.
        ("_build_media",
         lambda: _overlapped(
             lambda: MQ._phash_pairs(spark, sf_dir),
             lambda: MQ._audio_pairs(spark, sf_dir),
             lambda: MQ._video_pairs(spark, sf_dir))),
    ]
