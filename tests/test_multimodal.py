"""Multimodal plumbing: payload attach, typed metadata, Arrow decode stage,
frame-sample planning, and the explicit codec-stub seam."""

import pytest
from pyspark.sql import functions as F

from funnel_rocket_spark.operators import multimodal
from funnel_rocket_spark.plans import read_schema_columns


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return multimodal.attach_binary_payload(docs)


def test_decode_features_deterministic(spark, payloads):
    feats = multimodal.decode_features(payloads).collect()
    assert len(feats) == 500
    by_id = {r["id"]: r for r in feats}
    # cross-check one row against plain python
    import hashlib
    row = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .filter(F.col("doc_id") == 0).collect()[0]
    raw = row["text"].encode()
    assert by_id[0]["byte_len"] == len(raw)
    assert by_id[0]["digest"] == hashlib.md5(raw).hexdigest()
    assert by_id[0]["head_hex"] == raw[:4].hex()


def test_media_metadata_prunes_payload(payloads, tmp_path):
    meta = multimodal.with_media_metadata(payloads)
    assert meta.schema["meta"].dataType.fieldNames() == [
        "media_type", "codec", "width", "height", "duration_ms", "sample_rate"]
    # metadata-only query over a PARQUET source must not read the payload
    path = str(tmp_path / "media")
    meta.write.parquet(path)
    spark_df = payloads.sparkSession.read.parquet(path)
    q = spark_df.filter(F.col("meta.media_type") == "image").select(
        "id", "meta.width")
    [cols] = read_schema_columns(q)
    assert "payload" not in cols


def test_frame_sample_plan(payloads):
    plan = multimodal.frame_sample_plan(payloads.limit(3), n_frames=4)
    rows = plan.collect()
    assert len(rows) == 12
    assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3}


def test_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(b"\x89PNG...")


def test_resize_stage(payloads):
    out = multimodal.resize_images(payloads, width=64, height=64).collect()
    assert len(out) == 500
    for r in out[:10]:
        assert r["width"] == 64 and r["height"] == 64
        assert isinstance(r["thumb"], (bytes, bytearray))
        assert 0 < len(r["thumb"]) <= 64 * 64 // 8


def test_sample_frames_bounded_explosion(spark, payloads):
    """The byte-carrying 1-to-many stage: frame count tracks duration_ms
    (capped at max_frames), frames partition the payload bytes, and the
    concatenation of frames reconstructs the payload (deterministic
    slicing, no bytes lost)."""
    meta = multimodal.with_media_metadata(payloads.limit(20)).select(
        "id", "payload", F.col("meta.duration_ms").alias("duration_ms"))
    frames = multimodal.sample_frames(meta, every_ms=5000, max_frames=8)
    rows = frames.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    src = {r["id"]: (r["payload"], r["duration_ms"]) for r in meta.collect()}
    for vid, (payload, duration) in src.items():
        fs = sorted(by_id.get(vid, []), key=lambda r: r["frame_idx"])
        expected_n = min(max(duration // 5000, 1 if payload else 0), 8)
        assert len(fs) == expected_n, vid
        assert b"".join(f["frame"] for f in fs) == payload
        assert [f["frame_ms"] for f in fs] == [i * 5000 for i in range(len(fs))]
