"""Multimodal plumbing tests: decode / feature-extract / frame-sample
stages are deterministic, shape-correct, and Arrow-batched."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_property_rumah123_spark.operators import multimodal
from etl_property_rumah123_spark.sources.catalog import table
from tests.conftest import SF_SMOKE


def media(spark, n=50):
    docs = table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < n)
    return multimodal.documents_as_media(docs)


def test_decode_is_deterministic_and_digest_correct(spark):
    m = media(spark)
    out = {r["sample_id"]: r for r in multimodal.decode_media(m).collect()}
    src = {r["sample_id"]: r["payload"] for r in m.collect()}
    assert set(out) == set(src)
    for sid, payload in src.items():
        r = out[sid]
        assert r["payload_bytes"] == len(payload)
        assert r["payload_digest"] == hashlib.md5(bytes(payload)).hexdigest()
        assert 1 <= r["decoded_width"] <= 1920 and 1 <= r["decoded_height"] <= 1080


def test_feature_vectors_shape_and_norm(spark):
    out = multimodal.extract_features(media(spark), feat_dim=8).collect()
    assert out
    for r in out:
        assert len(r["feat"]) == 8
        assert abs(sum(r["feat"]) - 1.0) < 1e-5  # normalized histogram


def test_frame_sampling_expands_rows(spark):
    m = media(spark)
    n_samples = m.count()
    out = multimodal.sample_frames(m, n_frames=4)
    rows = out.collect()
    # every sample yields up to 4 frames, indexed 0..3, digests stable
    by_sample = {}
    for r in rows:
        by_sample.setdefault(r["sample_id"], []).append(r)
    assert len(by_sample) == n_samples
    for frames in by_sample.values():
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(idxs)))
        assert all(len(f["frame_digest"]) == 32 for f in frames)
    # determinism across runs
    again = {(r["sample_id"], r["frame_idx"]): r["frame_digest"]
             for r in multimodal.sample_frames(m, n_frames=4).collect()}
    assert {(r["sample_id"], r["frame_idx"]): r["frame_digest"] for r in rows} == again
