"""Drift guard for the bench harness's pinned family warm builds
(``df_spark/plans/warm.py``): the designated ``_build_*`` rows must
create EXACTLY the memo entries the member queries consume. If a query
changes its default args (different memo key), its family silently
un-pins — cold cost drifts back onto an arbitrary first-toucher row —
and this test fails instead."""

from __future__ import annotations

from df_spark.plans.memo import clear_all_memos
from df_spark.plans.warm import family_warm_builds
from df_spark.queries import load_registry

SF_DIR = "/root/testdata/sf0.001"

# key-class tags the warm builds are responsible for; member queries
# must not create NEW entries under these tags (single-consumer builds
# like BPE training or the containment result memo use other tags and
# legitimately stay on their query's row)
WARM_TAGS = {
    "combined", "cand", "near_dups",            # _build_dedup_*
    "xxsets", "xxarrays",                       # _build_dedup_rarity
    "tokens", "bigram_scored",                  # _build_tokens
    "pq_pts", "pq_cent", "pq_codes",            # _build_pq
    "pq_cent_inc", "pq_codes_inc",              # _build_pq_inc
    "order_parts",                              # _build_graph
    "phash_feats", "audio_bands", "video_frames",  # _build_media
}

# at least one member per warm build, spanning every family
MEMBER_QUERIES = [
    "minhash_near_dups", "dedup_clusters", "minhash_est_audit",
    "prefix_sim_join", "containment_join",
    "bigram_lm_score", "lm_quality_buckets", "vocab_oov_rate",
    "pq_quantize", "pq_adc_topk", "adc_recall_audit",
    "ann_incremental", "ann_drift_audit",
    "copurchase_pairs",
    "media_near_dup", "audio_fp_near_dup", "video_frame_dedup",
    "multimodal_dedup_report",
]


def _warm_tag_keys() -> set:
    from df_spark.operators.dedup import DEDUP_MEMO
    from df_spark.queries.graph_q import GRAPH_MEMO
    from df_spark.queries.multimodal import MEDIA_MEMO
    from df_spark.queries.similarity import PQ_MEMO, PQ_SCALARS
    from df_spark.queries.tokens import BPE_SCALARS, TOKEN_MEMO

    keys = set()
    for memo in (DEDUP_MEMO, GRAPH_MEMO, MEDIA_MEMO, PQ_MEMO, PQ_SCALARS,
                 TOKEN_MEMO, BPE_SCALARS):
        keys |= {k for k in memo._entries if k[0] in WARM_TAGS}
    return keys


def test_warm_builds_pin_family_first_touch(spark):
    reg = load_registry()
    clear_all_memos()
    for _name, thunk in family_warm_builds(spark, SF_DIR):
        thunk()
    built = _warm_tag_keys()
    # every warm tag must actually be present after the builds
    assert {k[0] for k in built} == WARM_TAGS
    for q in MEMBER_QUERIES:
        reg[q].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        now = _warm_tag_keys()
        assert now == built, (
            f"{q} created new warm-tag memo entries {now - built} — its "
            "args drifted from the designated warm build"
        )
