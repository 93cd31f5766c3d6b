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


def _ppm_bytes(img):
    import numpy as np

    h, w, _ = img.shape
    return b"P6\n# comment line\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img).tobytes()


def _bmp_bytes(img):
    """Hand-packed uncompressed 24-bit BMP (bottom-up BGR, 4-byte row
    padding) — built independently of the decoder under test."""
    import struct

    import numpy as np

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][..., ::-1].tobytes()  # RGB → BGR
        raster += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                      2835, 2835, 0, 0)
    return bytes(header + dib + raster)


def _gradient(h, w):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 255 // max(w - 1, 1)),
                     (y * 255 // max(h - 1, 1)),
                     ((x + y) % 256)], axis=-1).astype(np.uint8)


def test_decode_image_ppm_bmp_real_pixels(spark):
    """The codec-free decoders are REAL: pixel means from the Spark stage
    match numpy ground truth for both formats; a JPEG-magic payload
    degrades to decode_ok=false instead of failing the stage."""
    import numpy as np

    img = _gradient(13, 17)
    rows = [(1, bytearray(_ppm_bytes(img))),
            (2, bytearray(_bmp_bytes(img))),
            (3, bytearray(b"\xff\xd8\xff\xe0 not-a-decoder-here"))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in
           multimodal.decode_image_features(df).collect()}
    want = img.reshape(-1, 3).mean(axis=0)
    for i in (1, 2):
        assert got[i]["decode_ok"]
        assert (got[i]["width"], got[i]["height"]) == (17, 13)
        assert abs(got[i]["mean_r"] - want[0]) < 1e-3
        assert abs(got[i]["mean_g"] - want[1]) < 1e-3
        assert abs(got[i]["mean_b"] - want[2]) < 1e-3
    assert got[3]["decode_ok"] is False and got[3]["width"] is None


def test_decode_image_bmp_padding_and_orientation():
    """Width 3 forces row padding (9 -> 12 bytes); an asymmetric pattern
    pins the bottom-up flip and BGR swap."""
    import numpy as np

    img = np.zeros((2, 3, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)    # top-left red
    img[1, 2] = (0, 0, 255)    # bottom-right blue
    out = multimodal.decode_image(_bmp_bytes(img))
    assert np.array_equal(out, img)


def test_resize_decoded_images_round_trip(spark):
    """Thumbs re-encode as PPM and decode back to the exact
    nearest-neighbor resample numpy produces."""
    import numpy as np

    img = _gradient(32, 48)
    df = spark.createDataFrame([(7, bytearray(_ppm_bytes(img)))],
                               "id long, payload binary")
    row = multimodal.resize_decoded_images(df, width=8, height=6).collect()[0]
    assert row["decode_ok"]
    thumb = multimodal.decode_image(bytes(row["thumb"]))
    ys = (np.arange(6) * 32) // 6
    xs = (np.arange(8) * 48) // 8
    assert np.array_equal(thumb, img[ys][:, xs])


def test_decode_image_malformed_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.decode_image(b"P6\n4 4\n255\n\x00\x01")  # short raster
    with _pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")
