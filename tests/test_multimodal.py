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
    # every LEGAL profile decodes since r11; spec-ILLEGAL combinations
    # are malformed files (ValueError), not unsupported profiles
    for depth, color in [(16, 3), (3, 0), (8, 5), (2, 2)]:
        png = _png_chunks([
            (b"IHDR", struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, 0)),
            (b"IDAT", zlib.compress(b"\x00\x00\x00")), (b"IEND", b"")])
        with _pytest.raises(ValueError, match="illegal depth/color"):
            multimodal.decode_image(png)
    # interlace method outside {0 none, 1 Adam7}
    png = _png_chunks([
        (b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2)),
        (b"IDAT", zlib.compress(b"\x00\x00")), (b"IEND", b"")])
    with _pytest.raises(ValueError, match="interlace"):
        multimodal.decode_image(png)
    # palette image without a PLTE chunk
    png = _png_chunks([
        (b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)),
        (b"IDAT", zlib.compress(b"\x00\x00")), (b"IEND", b"")])
    with _pytest.raises(ValueError, match="PLTE"):
        multimodal.decode_image(png)
    # palette index past the PLTE table
    png = _png_chunks([
        (b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)),
        (b"PLTE", b"\x01\x02\x03"),  # 1 entry, index 0 only
        (b"IDAT", zlib.compress(b"\x00\x07")), (b"IEND", b"")])
    with _pytest.raises(ValueError, match="palette index"):
        multimodal.decode_image(png)


def _png_expected_rgb(samples, color, depth, palette):
    """The decode contract, computed independently in numpy: palette
    lookup, exact sub-byte gray scaling (255 divisible by 1/3/15),
    round-half-up 16→8, alpha dropped, gray replicated."""
    import numpy as np

    if color == 3:
        return palette[samples[..., 0]]
    if depth < 8:
        px = samples * (255 // ((1 << depth) - 1))
    elif depth == 8:
        px = samples
    else:
        px = (samples * 255 + 32767) // 65535
    px = px.astype(np.uint8)
    if color in (0, 4):
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]


@pytest.mark.parametrize("color,depth", [
    (c, d) for c, ds in sorted(multimodal._PNG_DEPTHS.items()) for d in ds])
@pytest.mark.parametrize("interlace", [0, 1])
def test_png_full_profile_roundtrip(color, depth, interlace):
    """r11: EVERY legal IHDR (color, depth) × both interlace methods
    round-trips exactly through _encode_png_ex → _decode_png across
    sizes that exercise empty Adam7 passes (1x1), partial passes and
    multi-block images — filter rotation inside each pass covers the
    full filter bank."""
    import numpy as np

    rng = np.random.default_rng(color * 100 + depth + interlace)
    spp = multimodal._PNG_SPP[color]
    for (h, w) in [(1, 1), (2, 3), (7, 5), (9, 16), (13, 11)]:
        hi = 1 << depth
        if color == 3:
            n = min(hi, 16)
            samples = rng.integers(0, n, size=(h, w, 1))
            palette = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
        else:
            samples = rng.integers(0, hi, size=(h, w, spp))
            palette = None
        png = multimodal._encode_png_ex(samples, color, depth, palette,
                                        interlace)
        got = multimodal._decode_png(png)
        want = _png_expected_rgb(samples, color, depth, palette)
        assert np.array_equal(got, want), (color, depth, interlace, h, w)


def test_png_matches_imageio(spark, tmp_path):
    """Independent-decoder agreement for the r11 profiles: the JVM
    ImageIO decode (Spark's `image` source) must reproduce our pixels
    EXACTLY on palette (8/4-bit, plain + Adam7), sub-byte gray, RGB
    Adam7, gray+alpha and 16-bit RGB. (16-bit GRAY is excluded —
    ImageIO surfaces it as a raw 16-bit raster Spark's ImageSchema
    can't carry; the contract test above covers it, and 16-bit RGB
    confirms the same round-half-up scaling against ImageIO.)"""
    import os

    import numpy as np

    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(11, 13, 1))
    idx4 = rng.integers(0, 16, size=(9, 7, 1))
    cases = {
        "pal.png": multimodal._encode_png_ex(idx, 3, 8, pal, 0),
        "pal_i.png": multimodal._encode_png_ex(idx, 3, 8, pal, 1),
        "pal4.png": multimodal._encode_png_ex(idx4, 3, 4, pal, 0),
        "pal4_i.png": multimodal._encode_png_ex(idx4, 3, 4, pal, 1),
        "rgb_i.png": multimodal._encode_png_ex(
            rng.integers(0, 256, size=(12, 10, 3)), 2, 8, None, 1),
        "ga.png": multimodal._encode_png_ex(
            rng.integers(0, 256, size=(6, 5, 2)), 4, 8, None, 0),
        "rgb16_i.png": multimodal._encode_png_ex(
            rng.integers(0, 65536, size=(5, 6, 3)), 2, 16, None, 1),
    }
    for d in (1, 2, 4):
        g = rng.integers(0, 1 << d, size=(8, 9, 1))
        cases[f"g{d}.png"] = multimodal._encode_png_ex(g, 0, d, None, 0)
        cases[f"g{d}_i.png"] = multimodal._encode_png_ex(g, 0, d, None, 1)
    for name, png in cases.items():
        (tmp_path / name).write_bytes(png)
    rows = (spark.read.format("image").load(str(tmp_path))
            .select("image.origin", "image.height", "image.width",
                    "image.nChannels", "image.data").collect())
    assert len(rows) == len(cases)
    for r in rows:
        name = os.path.basename(r["origin"])
        assert r["height"] > 0, f"ImageIO failed to decode {name}"
        ref = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(
            r["height"], r["width"], r["nChannels"])
        if r["nChannels"] >= 3:
            ref = ref[..., :3][..., ::-1]  # OpenCV-style BGR → RGB
        else:
            ref = np.repeat(ref[..., :1], 3, axis=2)
        mine = multimodal._decode_png(cases[name])
        assert np.array_equal(mine, ref), name


def test_pil_seam_decodes_jpeg_when_available(monkeypatch):
    """The optional-PIL path: with a (fake) PIL importable, an unknown
    format (WebP magic) routes through Image.open(...).convert('RGB')
    and returns the ndarray; a JPEG whose PROFILE the native baseline
    decoder rejects (progressive SOF2) falls through to the same seam
    rather than dying on the NotImplementedError — the deployment
    contract now that baseline JPEG decodes natively."""
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
    out = multimodal.decode_image(b"RIFF\x00\x00\x00\x00WEBPfake")
    assert np.array_equal(out, want)
    # minimal LOSSLESS JPEG (SOF3) — a profile the native decoder
    # rejects (baseline AND progressive decode natively since r10), so
    # it falls through to the seam
    lossless = b"\xff\xd8\xff\xc3\x00\x04\x08\x00"
    out = multimodal.decode_image(lossless)
    assert np.array_equal(out, want)
    # MALFORMED baseline JPEG stays a native ValueError — no second
    # decode attempt through PIL
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff truncated jpeg")


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
    # an OSError, not a ValueError — must come out normalized (the
    # progressive-JPEG prefix falls through the native decoder's
    # NotImplementedError into the PIL seam)
    def _boom(buf):
        raise OSError("cannot identify image file")
    fake_image_mod = types.SimpleNamespace(open=_boom)
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    with pytest.raises(ValueError, match="PIL decode failed"):
        multimodal.decode_image(b"\xff\xd8\xff\xc3\x00\x04\x08\x00")


def test_jpeg_fixture_roundtrip_exact():
    """The oracle fixture's exactness claim, asserted pixel-level:
    constant 8x8 luma tiles + all-8 quant + constant-128 chroma survive
    the lossy format bit-for-bit (constant block -> pure DC = 8(v-128),
    quantizer 8 -> integer, chroma all-zero coefficients)."""
    import numpy as np

    q8 = [8] * 64
    for i in (0, 1, 7, 23, 123, 178):
        ht, wt = 1 + i % 3, 1 + i % 5
        h, w = 8 * ht, 8 * wt
        tiles = ((i % 179) + 4 * np.arange(ht)[:, None]
                 + 2 * np.arange(wt)[None, :]).astype(np.float64)
        y_plane = np.kron(tiles, np.ones((8, 8)))
        c_plane = np.full((-(-h // 2), -(-w // 2)), 128.0)
        payload = multimodal._encode_jpeg_planes(
            [y_plane, c_plane, c_plane], h, w,
            [(2, 2), (1, 1), (1, 1)], [q8, q8])
        img = multimodal.decode_image(payload)
        assert img.shape == (h, w, 3)
        want = y_plane.astype(np.uint8)
        for ch in range(3):
            assert np.array_equal(img[..., ch], want), (i, ch)


def test_jpeg_roundtrip_error_bounded():
    """AC-coefficient paths (runs, EOB, ZRL) via lossy round-trips:
    smooth gradients reconstruct within a few levels at q95; a sparse
    spike image (long zero runs -> ZRL symbols) and pure noise stay
    within the quantizer's worst-case bound; grayscale single-component
    decode replicates to 3 channels."""
    import numpy as np

    rng = np.random.RandomState(7)
    ys, xs = np.mgrid[0:40, 0:56]
    smooth = np.stack([(ys * 2 + xs) % 200 + 20, (xs * 3) % 180 + 30,
                       np.full_like(ys, 77)], axis=2).astype(np.uint8)
    dec = multimodal.decode_image(
        multimodal.encode_jpeg(smooth, quality=95, subsample="444"))
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 4

    spikes = np.full((24, 24, 3), 128, dtype=np.uint8)
    spikes[5, 17], spikes[20, 3] = (250, 10, 90), (0, 255, 128)
    dec = multimodal.decode_image(
        multimodal.encode_jpeg(spikes, quality=95, subsample="444"))
    assert np.abs(dec.astype(int) - spikes.astype(int)).max() <= 48

    noise = rng.randint(0, 256, (37, 53, 3)).astype(np.uint8)
    for sub in ("444", "420"):
        dec = multimodal.decode_image(
            multimodal.encode_jpeg(noise, quality=95, subsample=sub))
        assert dec.shape == noise.shape
        # luma-ish bound: noise chroma at 420 is unrecoverable by design,
        # but the decoded mean must track closely
        assert abs(float(dec.mean()) - float(noise.mean())) <= 3.0

    g = rng.randint(0, 256, (17, 29)).astype(np.uint8)
    dec = multimodal.decode_image(multimodal.encode_jpeg(g, quality=90))
    assert dec.shape == (17, 29, 3)
    assert np.array_equal(dec[..., 0], dec[..., 1])
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 16


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: the same image encoded with restart intervals decodes
    identically to the unsegmented stream (predictors reset per
    interval, entropy segments re-aligned)."""
    import numpy as np

    ys, xs = np.mgrid[0:24, 0:40]
    img = np.stack([(ys * 5 + xs * 2) % 230, (xs * 4) % 220,
                    (ys * 3) % 210], axis=2).astype(np.uint8)
    plain = multimodal.decode_image(
        multimodal.encode_jpeg(img, quality=90, subsample="444"))
    for ri in (1, 2, 5):
        rgb = img.astype(np.float64)
        y = np.round(0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                     + 0.114 * rgb[..., 2])
        cb = np.round(128.0 - 0.168736 * rgb[..., 0]
                      - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2])
        cr = np.round(128.0 + 0.5 * rgb[..., 0]
                      - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2])
        payload = multimodal._encode_jpeg_planes(
            [y, cb, cr], 24, 40, [(1, 1), (1, 1), (1, 1)],
            [multimodal._quality_qt(multimodal._JPEG_BASE_QT_LUMA, 90),
             multimodal._quality_qt(multimodal._JPEG_BASE_QT_CHROMA, 90)],
            restart_interval=ri)
        assert b"\xff\xdd" in payload  # DRI present
        dec = multimodal.decode_image(payload)
        assert np.array_equal(dec, plain), ri


def test_jpeg_decodes_real_world_files():
    """Spark ships real libjpeg-produced baseline JPEGs in its mllib
    test data — decode them and pin shape + stability. (Pixel-level
    agreement vs the JVM ImageIO decoder is asserted in
    test_jpeg_matches_imageio, which needs the spark fixture.)"""
    import glob as _glob

    import numpy as np

    files = sorted(_glob.glob(
        "/opt/spark-*/data/mllib/images/origin/kittens/*.jpg"))
    if not files:
        pytest.skip("pyspark distribution images not present")
    decoded = 0
    for f in files:
        data = open(f, "rb").read()
        img = multimodal.decode_image(data)
        assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
        decoded += 1
    assert decoded >= 3


def test_jpeg_matches_imageio(spark):
    """Independent-decoder agreement: the JVM ImageIO decode (Spark's
    `image` data source) vs this pure-numpy decoder on real baseline
    JPEGs — within the small variance two conforming decoders may have
    (IDCT rounding ±1; chroma upsampling: ImageIO interpolates, we
    replicate like libjpeg -nosmooth)."""
    import glob as _glob

    import numpy as np

    dirs = _glob.glob("/opt/spark-*/data/mllib/images/origin/kittens")
    if not dirs:
        pytest.skip("pyspark distribution images not present")
    rows = (spark.read.format("image").load(dirs[0])
            .select("image.origin", "image.height", "image.width",
                    "image.nChannels", "image.data").collect())
    checked = 0
    for r in rows:
        f = r["origin"].replace("file:", "")
        if not f.endswith(".jpg"):
            continue
        try:
            mine = multimodal._decode_jpeg(open(f, "rb").read())
        except NotImplementedError:
            continue  # progressive etc. — not the contract under test
        ref = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(
            r["height"], r["width"], r["nChannels"])[..., ::-1]
        assert mine.shape == ref.shape
        d = np.abs(mine.astype(int) - ref.astype(int))
        assert d.mean() < 1.0, f
        assert np.percentile(d, 99.9) <= 8, f
        checked += 1
    assert checked >= 3


def test_jpeg_rejects_unsupported_and_malformed():
    """Profile seams raise NotImplementedError; malformed streams raise
    ValueError — the extractor catch contract."""
    import struct

    # progressive (SOF2) is SUPPORTED since r10 — a headers-only
    # fragment is a malformed STREAM now, not an unsupported profile
    with pytest.raises(ValueError, match="SOF"):
        multimodal._decode_jpeg(b"\xff\xd8\xff\xc2\x00\x04\x08\x00")
    # lossless (SOF3) stays an honest profile seam
    with pytest.raises(NotImplementedError, match="non-baseline"):
        multimodal._decode_jpeg(b"\xff\xd8\xff\xc3\x00\x04\x08\x00")
    # arithmetic coding conditioning (DAC)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        multimodal._decode_jpeg(b"\xff\xd8\xff\xcc\x00\x04\x00\x00")
    # 12-bit precision SOF0
    sof12 = b"\x0c" + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="12-bit"):
        multimodal._decode_jpeg(
            b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(sof12)) + sof12)
    # 4-component (CMYK-ish) SOF0
    sof4 = b"\x08" + struct.pack(">HH", 8, 8) + b"\x04" + \
        b"".join(bytes([c + 1, 0x11, 0]) for c in range(4))
    with pytest.raises(NotImplementedError, match="components"):
        multimodal._decode_jpeg(
            b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(sof4)) + sof4)
    # truncated segment / missing SOS / entropy exhaustion
    with pytest.raises(ValueError):
        multimodal._decode_jpeg(b"\xff\xd8\xff\xdb\xff\xff")
    with pytest.raises(ValueError, match="SOS"):
        multimodal._decode_jpeg(b"\xff\xd8\xff\xd9\x00\x00")
    import numpy as np
    good = multimodal.encode_jpeg(
        np.full((8, 8, 3), 99, dtype=np.uint8), quality=90)
    with pytest.raises(ValueError):
        multimodal._decode_jpeg(good[:len(good) // 2])
    # an unsupported-profile seam surfaces through decode_image too
    # (no PIL in this container)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xc3\x00\x04\x08\x00")


def test_jpeg_feature_query_decodes_fixture_corpus(spark):
    """The catalog fixture end-to-end at unit scale: synthesized
    constant-tile JPEGs decode back to their closed-form features."""
    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    feats = multimodal.decode_image_features(
        multimodal.synthesize_jpeg_payloads(docs)).collect()
    assert len(feats) == 30
    for r in feats:
        i = r["id"]
        want = float((i % 179) + 2 * (i % 3) + (i % 5))
        assert r["decode_ok"] and r["width"] == 8 * (1 + i % 5)
        assert r["height"] == 8 * (1 + i % 3)
        assert r["mean_r"] == r["mean_g"] == r["mean_b"] == want


def test_wav_roundtrip_and_bit_depths():
    """16-bit encode round-trips within 1 LSB; 8/24/32-bit integer and
    32/64-bit float payloads (hand-packed, independent of the encoder)
    decode to the same normalized samples."""
    import struct

    import numpy as np

    x = np.sin(np.arange(500) * 0.1) * 0.7
    y, sr = multimodal.decode_wav(multimodal.encode_wav(x, 16000))
    assert sr == 16000 and y.shape == (500, 1)
    assert np.abs(y[:, 0] - x).max() <= 1.0 / 32768

    st = np.stack([x, -x], axis=1)
    y, sr = multimodal.decode_wav(multimodal.encode_wav(st, 44100))
    assert y.shape == (500, 2)
    assert np.abs(y[:, 1] + y[:, 0]).max() <= 2.0 / 32768

    def wav(fmt_code, bits, data, channels=1, sr=8000):
        fmt = struct.pack("<HHIIHH", fmt_code, channels, sr,
                          sr * channels * bits // 8,
                          channels * bits // 8, bits)
        return (b"RIFF" + struct.pack("<I", 28 + len(fmt) + len(data))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    # 8-bit unsigned: 128 -> 0.0, 255 -> ~+1, 0 -> -1
    y, _ = multimodal.decode_wav(wav(1, 8, bytes([128, 255, 0])))
    assert y[0, 0] == 0.0 and y[1, 0] > 0.99 and y[2, 0] == -1.0
    # 24-bit: max positive / min negative / zero
    d24 = b"\xff\xff\x7f" + b"\x00\x00\x80" + b"\x00\x00\x00"
    y, _ = multimodal.decode_wav(wav(1, 24, d24))
    assert y[0, 0] > 0.999 and y[1, 0] == -1.0 and y[2, 0] == 0.0
    # 32-bit int and floats
    y, _ = multimodal.decode_wav(wav(1, 32, struct.pack("<i", -(1 << 31))))
    assert y[0, 0] == -1.0
    y, _ = multimodal.decode_wav(wav(3, 32, struct.pack("<f", 0.25)))
    assert y[0, 0] == 0.25
    y, _ = multimodal.decode_wav(wav(3, 64, struct.pack("<d", -0.5)))
    assert y[0, 0] == -0.5

    # seams: compressed formats NotImplementedError, malformed ValueError
    with pytest.raises(NotImplementedError, match="compressed"):
        multimodal.decode_wav(wav(85, 16, b"\x00\x00"))  # MP3-in-WAV
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_wav(
            b"RIFF\xff\x00\x00\x00WAVEfmt " + struct.pack("<I", 99))


def test_wav_feature_query_decodes_fixture_corpus(spark):
    """The catalog fixture end-to-end at unit scale: square-wave WAVs
    decode back to their closed-form features (rms = peak = the exact
    odd-amplitude value, zero_crossings = n-1), and a corrupt payload
    degrades to decode_ok=false instead of killing the stage."""
    docs = spark.range(25).select(F.col("id").alias("doc_id"))
    feats = multimodal.decode_audio_features(
        multimodal.synthesize_wav_payloads(docs)).collect()
    assert len(feats) == 25
    for r in feats:
        i = r["id"]
        a = round((101 + 2 * (i % 450)) / 32768.0, 6)
        n = 64 * (1 + i % 8)
        sr = 8000 * (1 + i % 3)
        assert r["decode_ok"] and r["sample_rate"] == sr
        assert r["channels"] == 1 and r["n_samples"] == n
        assert r["duration_ms"] == n * 1000 // sr
        assert r["rms"] == a == r["peak"]
        assert r["zero_crossings"] == n - 1

    bad = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04compressed mp3 bytes"))],
        "id long, payload binary")
    row = multimodal.decode_audio_features(bad).collect()[0]
    assert row["decode_ok"] is False and row["rms"] is None


def test_y4m_roundtrip_and_profiles():
    """Constant-gray frames survive the YCbCr round-trip bit-for-bit;
    arbitrary RGB round-trips within 1 level (C444); a hand-packed
    C420 stream (independent of the encoder) decodes with nearest
    chroma upsampling; seams and malformed streams raise correctly."""
    import numpy as np

    frames = np.stack([np.full((16, 24, 3), 50 + 10 * f, dtype=np.uint8)
                       for f in range(4)])
    dec, fps = multimodal.decode_y4m(multimodal.encode_y4m(frames, 25))
    assert fps == 25.0 and np.array_equal(dec, frames)

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (2, 12, 10, 3)).astype(np.uint8)
    dec, _ = multimodal.decode_y4m(multimodal.encode_y4m(rgb, 30))
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 1

    # hand-packed C420: 4x2 gray-128 frame -> chroma planes 2x1 of 128
    head = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
    frame = b"FRAME\n" + bytes([128] * 8) + bytes([128] * 2) + \
        bytes([128] * 2)
    dec, _ = multimodal.decode_y4m(head + frame)
    assert dec.shape == (1, 2, 4, 3)
    assert np.all(dec == 128)

    with pytest.raises(NotImplementedError, match="colorspace"):
        multimodal.decode_y4m(b"YUV4MPEG2 W4 H2 C422\nFRAME\n" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="interlaced"):
        multimodal.decode_y4m(b"YUV4MPEG2 W4 H2 It\nFRAME\n" + b"\x00" * 16)
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_y4m(b"not video")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_y4m(head + b"FRAME\n" + bytes(5))
    with pytest.raises(ValueError, match="odd"):
        multimodal.decode_y4m(b"YUV4MPEG2 W3 H2 C420\nFRAME\n" + bytes(9))
    with pytest.raises(ValueError, match="no frames"):
        multimodal.decode_y4m(b"YUV4MPEG2 W4 H2 C420\n")


def test_y4m_frame_query_decodes_fixture_corpus(spark):
    """The catalog fixture end-to-end at unit scale: per-frame rows
    with the closed-form gray ramp; a corrupt payload degrades to one
    decode_ok=false row."""
    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    rows = multimodal.decode_video_frames(
        multimodal.synthesize_y4m_payloads(docs)).collect()
    assert len(rows) == sum(1 + i % 4 for i in range(20))
    for r in rows:
        i, f = r["id"], r["frame_idx"]
        assert r["decode_ok"] and r["fps"] == 25.0
        assert r["width"] == 8 * (1 + i % 3)
        assert r["height"] == 8 * (1 + i % 2)
        assert r["n_frames"] == 1 + i % 4
        assert r["mean_r"] == r["mean_g"] == r["mean_b"] == (i % 200) + 10 * f

    bad = spark.createDataFrame(
        [(9, bytearray(b"\x00\x00\x01\xba mpeg-ps bytes"))],
        "id long, payload binary")
    out = multimodal.decode_video_frames(bad).collect()
    assert len(out) == 1 and out[0]["decode_ok"] is False
    assert out[0]["frame_idx"] is None


def test_jpeg_encoder_interop_with_imageio(spark, tmp_path):
    """The ENCODER writes standards-conformant files: the independent
    JVM ImageIO decoder (not our code) must accept them and reproduce
    the source image — this is the check that a self-cancelling
    encode→decode round-trip can't provide (a typo'd Huffman table
    would round-trip fine through our own decoder and fail here)."""
    import numpy as np

    ys, xs = np.mgrid[0:40, 0:56]
    img = np.stack([(ys * 2 + xs) % 200 + 20, (xs * 3) % 180 + 30,
                    np.full_like(ys, 77)], axis=2).astype(np.uint8)
    p = tmp_path / "interop.jpg"
    p.write_bytes(multimodal.encode_jpeg(img, quality=90, subsample="444"))
    row = (spark.read.format("image").load(str(tmp_path))
           .select("image.height", "image.width", "image.nChannels",
                   "image.data").collect()[0])
    assert (row["height"], row["width"]) == (40, 56)  # not refused (-1)
    ref = np.frombuffer(bytes(row["data"]), dtype=np.uint8).reshape(
        40, 56, row["nChannels"])[..., ::-1]
    assert np.abs(ref.astype(int) - img.astype(int)).max() <= 4


def test_audio_spectral_features_fixture_and_degrade(spark):
    """The FFT stage end-to-end at unit scale: the period-4 tone's
    energy lands exactly at bin n/4 (dominant freq = centroid = sr/4),
    and a corrupt payload degrades to decode_ok=false."""
    docs = spark.range(16).select(F.col("id").alias("doc_id"))
    rows = multimodal.audio_spectral_features(
        multimodal.synthesize_tone_wav_payloads(docs)).collect()
    assert len(rows) == 16
    for r in rows:
        i = r["id"]
        n, sr = 64 * (1 + i % 8), 8000 * (1 + i % 3)
        assert r["decode_ok"] and r["n_samples"] == n
        assert r["dominant_bin"] == n // 4
        assert r["dominant_freq_hz"] == sr / 4 == r["spectral_centroid_hz"]

    bad = spark.createDataFrame([(1, bytearray(b"OggS not pcm"))],
                                "id long, payload binary")
    out = multimodal.audio_spectral_features(bad).collect()
    assert len(out) == 1 and out[0]["decode_ok"] is False


def test_jpeg_progressive_matches_imageio(spark):
    """Progressive JPEG (SOF2 — spectral selection + successive
    approximation, DC/AC first and refinement scans, EOB runs) decodes
    within IDCT rounding (±1) of the independent JVM ImageIO decoder on
    the real progressive file shipped with Spark."""
    import glob as _glob

    import numpy as np

    files = _glob.glob(
        "/opt/spark-*/data/mllib/images/origin/multi-channel/grayscale.jpg")
    if not files:
        pytest.skip("pyspark distribution images not present")
    f = files[0]
    row = (spark.read.format("image").load(f)
           .select("image.height", "image.width", "image.nChannels",
                   "image.data").collect()[0])
    ref = np.frombuffer(bytes(row["data"]), dtype=np.uint8).reshape(
        row["height"], row["width"], row["nChannels"])[..., 0]
    mine = multimodal.decode_image(open(f, "rb").read())
    assert mine.shape == (row["height"], row["width"], 3)
    assert np.array_equal(mine[..., 0], mine[..., 1])  # gray replicates
    d = np.abs(mine[..., 0].astype(int) - ref.astype(int))
    assert d.max() <= 1 and d.mean() < 0.05
