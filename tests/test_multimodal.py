"""Multimodal binary-column plumbing tests: the decode itself is a
deterministic stub (no codec libs in this container), but the Spark
plumbing — schema, Arrow batching, mapInPandas signature, native
metadata, frame-sampling fan-out — is real and asserted here.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_stub_features,
    extract_features,
    frame_sample_plan,
    with_media_meta,
)
from etl_spark.multimodal.binary import decode_media

ROWS = [
    (0, "image", "image/png", 64, 64, None, b"\x89PNG fake payload 0"),
    (1, "image", "image/png", 32, 32, None, b"\x89PNG fake payload 1"),
    (2, "audio", "audio/wav", None, None, 2500, b"RIFF fake wav"),
    (3, "video", "video/mp4", 640, 480, 3500, b"\x00\x00ftyp fake mp4"),
    (4, "image", "image/png", 8, 8, None, None),  # missing payload
]


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(ROWS, MEDIA_SCHEMA)


def test_native_media_meta(spark, media):
    out = {r["media_id"]: (r["n_bytes"], r["content_sha256"])
           for r in with_media_meta(media).collect()}
    payload = ROWS[0][6]
    assert out[0] == (len(payload), hashlib.sha256(payload).hexdigest())
    assert out[4] == (None, None)


def test_extract_features_stub(spark, media):
    feats = extract_features(media, dim=8)
    got = {r["media_id"]: r for r in feats.collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    r0 = got[0]
    assert r0["content_sha256"] == hashlib.sha256(ROWS[0][6]).hexdigest()
    assert r0["feature"] == pytest.approx(decode_stub_features(ROWS[0][6], 8))
    assert len(r0["feature"]) == 8
    assert all(0.0 <= v < 1.0 for v in r0["feature"])
    assert got[4]["feature"] is None
    # deterministic: same payload -> same feature, distinct payloads differ
    assert got[0]["feature"] != got[1]["feature"]


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_media("image", b"anything")


def test_frame_sample_plan(spark, media):
    plan = frame_sample_plan(media, every_ms=1000)
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in plan.collect())
    assert got == [(3, 0), (3, 1000), (3, 2000), (3, 3000)]


def test_feature_pipeline_composes_with_dedup(spark, media):
    """Features are a normal DataFrame: exact-dup detection over the
    payload hash works unchanged (media dedup = same groupBy)."""
    feats = extract_features(media, dim=4).filter(F.col("content_sha256").isNotNull())
    dups = feats.groupBy("content_sha256").count().filter("count > 1").count()
    assert dups == 0
