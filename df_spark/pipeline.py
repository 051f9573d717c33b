"""End-to-end training-data preparation pipeline — the north-star
composition: quality scoring + language ID + exact dedup + near-dup
clustering + token accounting in one pass over the corpus, producing a
per-document decision table (keep/drop + reasons).

Every stage is one of the engine's verified operators; the pipeline is
their composition, so the whole thing remains oracle-checkable. Plan
shape at scale: per-doc scoring is map-side; exact dedup is one
fingerprint groupBy; near-dup grouping is the LSH pipeline + iterative
components; the final assembly is broadcast-friendly joins on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import text as X
from .operators import dedup as D
from .operators.clustering import dedup_groups


def prepare_documents(
    docs: DataFrame,
    min_quality: float = 0.1,
    min_jaccard: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document decision table: scores, fingerprints, dedup group,
    and the final ``keep`` verdict with its reason.

    Keep rules (applied in order, first failure wins):
    1. quality >= min_quality
    2. doc is the min-id holder of its exact-content fingerprint
    3. doc is the min-id representative of its near-dup cluster
    """
    # the text column is NOT carried: every downstream consumer needs
    # only the narrow per-doc scores, and scored feeds two consumers
    # (the exact-dup keeper aggregate and the final assembly join), so
    # it is eagerly checkpointed — one scoring pass instead of two, and
    # the checkpoint holds five narrow columns, not the corpus text
    scored = docs.select(
        F.col(id_col),
        X.lang_id(F.col(text_col)).alias("detected_lang"),
        X.quality_score(F.col(text_col)).alias("quality"),
        X.bpe_token_count(F.col(text_col)).alias("n_tokens"),
        X.fingerprint_md5(F.col(text_col)).alias("fp"),
    ).localCheckpoint(eager=True)

    exact_keep = scored.groupBy("fp").agg(F.min(id_col).alias("__exact_keeper"))
    pairs = D.minhash_near_dups(docs, min_jaccard=min_jaccard, id_col=id_col, text_col=text_col)
    groups = dedup_groups(pairs, docs, id_col=id_col).select(
        F.col(id_col), F.col("group_id")
    )

    out = (
        scored.join(exact_keep, "fp")
        .join(groups, id_col)
        .withColumn("is_exact_keeper", F.col(id_col) == F.col("__exact_keeper"))
        .withColumn("is_cluster_rep", F.col(id_col) == F.col("group_id"))
    )
    verdict = (
        F.when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(~F.col("is_exact_keeper"), F.lit("exact_dup"))
        .when(~F.col("is_cluster_rep"), F.lit("near_dup"))
        .otherwise(F.lit("keep"))
    )
    return out.select(
        id_col,
        "detected_lang",
        "quality",
        "n_tokens",
        "fp",
        "group_id",
        verdict.alias("verdict"),
        (verdict == "keep").alias("keep"),
    )
