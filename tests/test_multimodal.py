"""Multimodal binary-column plumbing: Arrow-batched mapInPandas with a
stubbed decode (no codecs in this container — the Spark-side contract is
what's under test)."""

from __future__ import annotations

import hashlib

import pytest

from k8stream_spark.analytics import multimodal


def test_attach_blob_schema(docs_df):
    out = multimodal.attach_blob(docs_df)
    assert dict(out.dtypes)["blob"] == "binary"
    row = out.where("doc_id = 1").collect()[0]
    assert row.n_bytes == len(bytes(row.blob))


def test_blob_meta_matches_hashlib(docs_df):
    blobs = multimodal.attach_blob(docs_df)
    metas = {r.doc_id: r for r in multimodal.blob_meta_pandas(blobs).collect()}
    texts = {r.doc_id: r.text for r in docs_df.collect()}
    for doc_id, text in texts.items():
        raw = text.encode()
        assert metas[doc_id].n_bytes == len(raw)
        assert metas[doc_id].sha256 == hashlib.sha256(raw).hexdigest()


def test_decode_image_is_stubbed(docs_df):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(multimodal.attach_blob(docs_df))


def test_fake_decode_features_shape(docs_df):
    blobs = multimodal.attach_blob(docs_df)
    feats = multimodal.fake_decode_features(blobs).collect()
    assert len(feats) == docs_df.count()
    for r in feats:
        assert len(r.features) == multimodal.FAKE_FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 0.01  # normalized histogram


def test_frame_sample_stride(spark):
    df = spark.createDataFrame([(1, "x" * 64 * 25)], "doc_id bigint, text string")
    blobs = multimodal.attach_blob(df)
    idx = sorted(r.frame_idx for r in multimodal.frame_sample_stub(blobs).collect())
    assert idx == [0, 10, 20]
    short = multimodal.attach_blob(
        spark.createDataFrame([(2, "tiny")], "doc_id bigint, text string"))
    assert multimodal.frame_sample_stub(short).count() == 0
