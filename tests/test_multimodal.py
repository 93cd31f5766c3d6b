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
    with _pytest.raises(ValueError):  # PNG magic but no IHDR
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_png_roundtrip_all_filters():
    """encode_png rotates the scanline filter per row, so any image with
    >= 5 rows round-trips through every filter type; widths cover the
    1-pixel-row edge (no left neighbor) and the cumsum Sub path."""
    import numpy as np

    rng = np.random.default_rng(7)
    for (h, w) in [(1, 1), (1, 5), (7, 1), (8, 16), (13, 9), (5, 3)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = multimodal.decode_image(multimodal.encode_png(img))
        assert np.array_equal(out, img), (h, w)


def _png_chunks(ctype_data_pairs):
    import struct
    import zlib

    out = bytearray(multimodal._PNG_SIG)
    for ctype, data in ctype_data_pairs:
        out += struct.pack(">I", len(data)) + ctype + data
        out += struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    return bytes(out)


def test_png_gray_and_rgba_profiles():
    """8-bit grayscale replicates to RGB; RGBA drops alpha — both under
    non-trivial filters (Up on the RGBA rows)."""
    import struct
    import zlib

    import numpy as np

    g = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(2))
    png = _png_chunks([
        (b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)),
        (b"IDAT", zlib.compress(raw)), (b"IEND", b"")])
    out = multimodal.decode_image(png)
    assert out.shape == (2, 3, 3)
    assert all(np.array_equal(out[..., ch], g) for ch in range(3))

    rng = np.random.default_rng(3)
    ra = rng.integers(0, 256, size=(2, 2, 4), dtype=np.uint8)
    rows = []
    prev = np.zeros(8, dtype=np.int32)
    for y in range(2):
        cur = ra[y].astype(np.int32).reshape(-1)
        rows.append(b"\x02" + ((cur - prev) % 256).astype(np.uint8)
                    .tobytes())
        prev = cur
    png = _png_chunks([
        (b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)),
        (b"IDAT", zlib.compress(b"".join(rows))), (b"IEND", b"")])
    assert np.array_equal(multimodal.decode_image(png), ra[..., :3])


def test_png_rejects_corruption_and_exotics():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    bad = bytearray(multimodal.encode_png(img))
    bad[20] ^= 0xFF  # flip a byte inside IHDR → CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        multimodal.decode_image(bytes(bad))
    # 16-bit depth: honest NotImplementedError, not a wrong decode
    png16 = _png_chunks([
        (b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)),
        (b"IDAT", zlib.compress(b"\x00" * 7)), (b"IEND", b"")])
    with _pytest.raises(NotImplementedError, match="depth"):
        multimodal.decode_image(png16)


def test_pil_seam_decodes_jpeg_when_available(monkeypatch):
    """The optional-PIL path: with a (fake) PIL importable, an unknown
    format routes through Image.open(...).convert('RGB') and returns the
    ndarray — the exact deployment contract for JPEG/WebP."""
    import sys
    import types

    import numpy as np

    want = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)

    class _FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            return want

    fake_image_mod = types.SimpleNamespace(
        open=lambda buf: _FakeImg())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    out = multimodal.decode_image(b"\xff\xd8\xff fake jpeg bytes")
    assert np.array_equal(out, want)


def test_png_feature_query_decodes_fixture_corpus(spark):
    """The catalog fixture end-to-end at unit scale: synthesized gradient
    PNGs decode back to their closed-form features."""
    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    feats = multimodal.decode_image_features(
        multimodal.synthesize_png_payloads(docs)).collect()
    assert len(feats) == 20
    for r in feats:
        i = r["id"]
        assert r["decode_ok"] and r["width"] == 1 + i % 16
        assert r["height"] == 1 + i % 8
        assert r["mean_r"] == round(i % 200 + (r["width"] - 1) / 2, 4)
        assert r["mean_g"] == round((7 * i) % 200 + (r["height"] - 1) / 2, 4)
        assert r["mean_b"] == float((13 * i) % 256)


def test_decode_errors_normalize_to_valueerror(monkeypatch):
    """Every malformed-payload failure must surface as ValueError (the
    type the feature extractors catch) — never zlib.error, struct.error,
    or a PIL exception, any of which would escape the mapInPandas catch
    and kill a 1000-executor stage on one corrupt blob."""
    import struct
    import sys
    import types
    import zlib

    # PNG truncated at a chunk boundary: CRC-valid IHDR, no IDAT -> the
    # empty deflate stream raises zlib.error unless normalized
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png_no_idat = bytearray(multimodal._PNG_SIG)
    for ctype, data in [(b"IHDR", ihdr), (b"IEND", b"")]:
        png_no_idat += struct.pack(">I", len(data)) + ctype + data
        png_no_idat += struct.pack(
            ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="deflate"):
        multimodal.decode_image(bytes(png_no_idat))

    # CRC-valid but SHORT IHDR -> struct.error unless normalized
    short = bytearray(multimodal._PNG_SIG)
    data = b"\x00\x00\x00\x02"  # 4 bytes, needs 13
    short += struct.pack(">I", len(data)) + b"IHDR" + data
    short += struct.pack(">I", zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="IHDR"):
        multimodal.decode_image(bytes(short))

    # PIL present but the payload is garbage: UnidentifiedImageError is
    # an OSError, not a ValueError — must come out normalized
    def _boom(buf):
        raise OSError("cannot identify image file")
    fake_image_mod = types.SimpleNamespace(open=_boom)
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    with pytest.raises(ValueError, match="PIL decode failed"):
        multimodal.decode_image(b"\xff\xd8\xff truncated jpeg")
