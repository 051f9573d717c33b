"""Multimodal plumbing tests: binary columns, metadata, mapInPandas
featurizer (stubbed codec), frame sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from df_spark import multimodal as M
from df_spark.sources.tables import load_sdf


def media_df(spark, sf_dir):
    docs = load_sdf(spark, sf_dir, "documents").limit(20)
    return M.documents_as_media(docs)


def test_attach_media_meta(spark, sf_dir):
    df = M.attach_media_meta(media_df(spark, sf_dir))
    row = df.filter(F.col("media_id") == 0).collect()[0]
    assert row.meta.n_bytes == len(row.payload)
    assert row.meta.content_md5 == hashlib.md5(bytes(row.payload)).hexdigest()


def test_featurize_stub(spark, sf_dir):
    feats = M.featurize(media_df(spark, sf_dir)).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.feature) == M.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.feature)
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in M.featurize(media_df(spark, sf_dir)).collect()}
    for r in feats:
        assert again[r.media_id] == r.feature


def test_real_codec_is_explicit_stub(spark, sf_dir):
    with pytest.raises(Exception, match="no codec"):
        M.featurize(media_df(spark, sf_dir), use_stub=False).collect()


def test_frame_sample(spark, sf_dir):
    frames = M.frame_sample(media_df(spark, sf_dir), every_n_bytes=64)
    rows = frames.filter(F.col("media_id") == 0).orderBy("frame_no").collect()
    src = media_df(spark, sf_dir).filter(F.col("media_id") == 0).collect()[0]
    n_expected = (len(src.payload) + 63) // 64
    assert len(rows) == n_expected
    rebuilt = b"".join(bytes(r.frame_bytes) for r in rows)
    assert rebuilt == bytes(src.payload)
