"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over ``mapInPandas``.

The Spark-side plumbing is real and tested — schema, partitioning,
UDF signature, batch shape. The actual codec step is STUBBED: this
container has no image/audio libraries, so ``decode_stub`` computes a
deterministic fake feature vector from the bytes (documented
NotImplementedError path for real codecs). Swapping in PIL/librosa
means changing only the inner function — the distributed plan is
unchanged.

Scale notes: binary payloads ride in parquet column chunks;
``maxPartitionBytes`` bounds per-task memory. The featurizer is
mapInPandas (no shuffle); downstream joins/aggregations see only the
small typed outputs, never the blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("content_md5", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_md5 string, "
    "feature array<float>"
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Compute typed metadata columns from the blob (JVM-side: length +
    md5; no Python)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(payload_col)).alias("content_md5"),
            F.coalesce(F.col("source") if "source" in df.columns else F.lit(None), F.lit("unknown")).alias("source"),
        ),
    )


def _decode_real(kind: str, payload: bytes) -> list[float]:
    """Real codec hook — intentionally unimplemented in this container
    (no PIL/librosa/ffmpeg). Replace in production."""
    raise NotImplementedError(
        f"no codec for {kind!r} in this environment; use decode_stub"
    )


def decode_stub(kind: str, payload: bytes) -> list[float]:
    """Deterministic fake featurizer: FEATURE_DIM floats derived from
    the md5 of the payload (stable across runs/executors). Stands in
    for decode→resize→embed so the distributed pipeline is testable."""
    digest = hashlib.md5(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def featurize(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """media rows → per-item feature vectors via mapInPandas (Arrow
    batches; one Python worker per task, no shuffle)."""
    decode = decode_stub if use_stub else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(k, p)
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "content_md5": [
                        hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload at fixed strides
    (JVM-side substring on binary) — the plumbing pattern for
    video-frame extraction where each output row is one frame."""
    idx = F.sequence(
        F.lit(1), F.greatest(F.length("payload").cast("int"), F.lit(1)), F.lit(every_n_bytes)
    )
    return (
        df.select(
            "media_id",
            "kind",
            F.posexplode(idx).alias("frame_no", "offset"),
            F.col("payload"),
        )
        .select(
            "media_id",
            "kind",
            "frame_no",
            F.substring(F.col("payload"), F.col("offset"), every_n_bytes).alias("frame_bytes"),
        )
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as binary payloads so
    the multimodal path has real data to run on in this environment."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.col("source"),
    )
