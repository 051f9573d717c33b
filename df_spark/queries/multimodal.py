"""Multimodal plumbing query: binary payload metadata (byte length,
content hash, magic-prefix probe) computed JVM-side over blobs adapted
from the documents table. The Pandas-UDF featurizer itself is covered
by unit tests (not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..multimodal import documents_as_media
from ..sources.tables import load_sdf
from . import register


@register(
    "media_meta",
    sql="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           substr(text, 1, 4) AS magic_prefix
    FROM documents
    """,
)
def media_meta(spark, sf_dir):
    media = documents_as_media(load_sdf(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.decode(F.substring("payload", 1, 4), "utf-8").alias("magic_prefix"),
    )
