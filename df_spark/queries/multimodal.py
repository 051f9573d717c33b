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


@register(
    "wav_energy_windows",
    sql="""
    WITH t AS (
      SELECT doc_id AS media_id, text, (length(text) // 100) AS nw
      FROM documents WHERE length(text) >= 100
    ),
    w AS (
      SELECT media_id, text, u.k
      FROM t, UNNEST(generate_series(0, nw - 1)) AS u(k)
    )
    SELECT media_id, k::BIGINT AS win_idx,
           8000::BIGINT AS rate_hz,
           CAST(list_sum(list_transform(generate_series(1, 100),
             j -> CAST(ascii(substr(text, k * 100 + j, 1)) - 64 AS BIGINT)
                  * CAST(ascii(substr(text, k * 100 + j, 1)) - 64 AS BIGINT)))
             AS BIGINT) AS energy
    FROM w
    """,
)
def wav_energy_windows(spark, sf_dir):
    """Audio-pipeline plumbing end-to-end: synthesize a real 16-bit
    PCM WAV per document (samples = text bytes - 64, so the oracle can
    recompute them from the text), then run the windowed-energy
    featurizer over the binary payloads — encode and decode both go
    through the stdlib ``wave`` container, so a header/byte-order bug
    anywhere in the round trip is a value mismatch against the oracle,
    which never touches WAV at all. rate_hz is read from the PARSED
    header (a constant-folded 8000 in the oracle), pinning the header
    fields too.

    Scale shape: two chained ``mapInPandas`` passes (encode, then
    featurize) with no shuffle between them — Catalyst fuses them into
    one Python-runner stage; blobs never cross an exchange; output is
    small typed rows (~n_chars/100 per doc). At 100 TB the encode pass
    is replaced by reading real audio blobs from parquet — the
    featurizer and everything downstream are unchanged."""
    docs = load_sdf(spark, sf_dir, "documents")
    from ..multimodal import documents_as_wav, wav_window_energy
    return wav_window_energy(documents_as_wav(docs), window=100)
