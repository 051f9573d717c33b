"""The end-to-end training-data-prep pipeline as an oracle-checked
query: every stage's SQL twin composed into one statement."""

from __future__ import annotations

from ..functions import text as X
from ..operators import dedup as D
from ..pipeline import prepare_documents
from ..sources.tables import load_sdf
from . import register

_MIN_QUALITY = 0.1
_MIN_JACCARD = 0.6


@register(
    "llm_data_pipeline",
    sql=f"""
    WITH RECURSIVE scored AS MATERIALIZED (
      SELECT doc_id,
             {X.lang_id_sql('text')} AS detected_lang,
             {X.quality_score_sql('text')} AS quality,
             {X.bpe_token_count_sql('text')} AS n_tokens,
             {X.fingerprint_md5_sql('text')} AS fp
      FROM documents
    ),
    exact_keep AS (
      SELECT fp, MIN(doc_id) AS exact_keeper FROM scored GROUP BY fp
    ),
    pairs AS MATERIALIZED (
      {D.minhash_near_dups_sql('documents', _MIN_JACCARD)}
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, node) AS (
      SELECT u, u FROM sym
      UNION
      SELECT r.src, s.v FROM reach r JOIN sym s ON r.node = s.u
    ),
    comp AS (
      SELECT src AS node, MIN(node) AS comp FROM reach GROUP BY src
    ),
    assembled AS (
      SELECT s.doc_id, s.detected_lang, s.quality, s.n_tokens, s.fp,
             COALESCE(c.comp, s.doc_id) AS group_id,
             e.exact_keeper
      FROM scored s
      JOIN exact_keep e ON s.fp = e.fp
      LEFT JOIN comp c ON c.node = s.doc_id
    )
    SELECT doc_id, detected_lang, quality, n_tokens, fp, group_id,
           CASE WHEN quality < {_MIN_QUALITY} THEN 'low_quality'
                WHEN doc_id <> exact_keeper THEN 'exact_dup'
                WHEN doc_id <> group_id THEN 'near_dup'
                ELSE 'keep' END AS verdict,
           (CASE WHEN quality < {_MIN_QUALITY} THEN 'low_quality'
                 WHEN doc_id <> exact_keeper THEN 'exact_dup'
                 WHEN doc_id <> group_id THEN 'near_dup'
                 ELSE 'keep' END) = 'keep' AS keep
    FROM assembled
    """,
)
def llm_data_pipeline(spark, sf_dir):
    docs = load_sdf(spark, sf_dir, "documents")
    return prepare_documents(docs, min_quality=_MIN_QUALITY, min_jaccard=_MIN_JACCARD)


@register(
    "shard_assign",
    sql=f"""
    SELECT {D.h32_sql(D.normalized_sql('text'))} % 32 AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS first_doc
    FROM documents
    GROUP BY 1
    """,
)
def shard_assign(spark, sf_dir):
    """Deterministic training-shard assignment: shard =
    content_hash(normalized text) mod 32. Content hashing (not
    doc_id/random) is what a training pipeline wants — assignment is
    stable under re-ingestion, reordering, and id reassignment, and the
    md5-derived hash is uniform so the 32 shards stay balanced (law of
    large numbers: ±0.1% at 100 TB). One hash aggregate on the shard
    key; the same expression with partitionBy('shard') is the writer
    layout. Cross-engine exact via the md5-derived h32
    (functions/hashing.py parity contract).
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import h32
    from ..functions.text import normalized

    docs = load_sdf(spark, sf_dir, "documents")
    return (
        docs.select(
            (h32(normalized(F.col("text"))) % 32).alias("shard"),
            "doc_id", "n_chars", "lang",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("first_doc"),
        )
    )
