"""Multimodal (image/audio/video) column plumbing.

Media payloads ride as opaque ``binary`` columns with typed metadata columns
next to them. The Spark-side machinery here is real and tested — schemas,
Arrow-batched ``mapInPandas`` decode stage, partition-size guidance. The
codec layer is split honestly in two:

* REAL decode for the container formats that need no codec library:
  binary PPM (P6) and uncompressed 24-bit BMP, parsed in pure numpy
  (``decode_image``), with pixel-level feature extraction
  (``decode_image_features``) and a true nearest-neighbor thumbnailer
  (``resize_decoded_images``) built on top.
* STUB for compressed codecs (PNG/JPEG/audio/video — PIL/torchaudio/pyav
  are not available in this environment): ``decode_image_stub`` raises
  ``NotImplementedError`` where the real decoder plugs in, and
  ``decode_features`` computes deterministic byte-level stand-ins.

At 100 TB: binary columns dominate partition size — size
``spark.sql.files.maxPartitionBytes`` for ~128 MB of *payload*, keep the
decode stage after a narrow projection of (id, payload) so shuffled bytes are
minimal, and let ``mapInPandas`` stream Arrow batches (bounded memory,
``spark.sql.execution.arrow.maxRecordsPerBatch`` controls batch height).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id bigint, byte_len bigint, digest string, head_hex string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Demo payload builder: utf-8 bytes of a text column as the media blob.

    Real pipelines read the blob from Parquet/tar shards directly; this keeps
    the downstream plumbing exercisable with the available test data.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """Where a COMPRESSED-format decode would go (PIL.Image.open →
    size/mode/EXIF).

    STUB: compressed codecs (PNG/JPEG/WebP/...) are not available in this
    environment; ``decode_image`` below handles the codec-free formats.
    """
    raise NotImplementedError(
        "Compressed image decoding requires PIL/torchvision — not available "
        "here. Swap this function for a real decoder in deployment; "
        "decode_image() already handles PPM (P6) and uncompressed BMP."
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, w: int, bpp: int):
    """Reverse PNG scanline filtering (types 0-4) → (h, w*bpp) uint8.

    Sub is a per-channel cumulative sum (vectorized); Average/Paeth are
    inherently sequential in x (each byte needs the reconstructed left
    neighbor) so they loop — fine for the fixture-scale images this
    pure-python decoder exists for."""
    import numpy as np

    stride = w * bpp
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp]
            rec = np.cumsum(cur.reshape(w, bpp), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average
            rec = cur
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) % 256
        elif f == 4:  # Paeth
            rec = cur
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) % 256
        else:
            raise ValueError(f"PNG: unknown filter type {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def _decode_png(payload: bytes):
    """REAL PNG decode, stdlib-zlib + numpy — no codec library needed.

    Supports the overwhelmingly common profile: 8-bit depth, color type
    0 (gray), 2 (RGB) or 6 (RGBA, alpha dropped), non-interlaced, all
    five scanline filters, CRC-verified chunks. Anything else raises
    ``NotImplementedError`` (16-bit/palette/interlaced) or ``ValueError``
    (malformed)."""
    import struct
    import zlib

    import numpy as np

    pos, w = len(_PNG_SIG), None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("PNG: truncated chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: bad CRC in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            try:
                w, h, depth, color, _comp, _filt, interlace = \
                    struct.unpack(">IIBBBBB", data)
            except struct.error as ex:  # CRC-valid but short IHDR
                raise ValueError(f"PNG: malformed IHDR ({ex})") from ex
            if depth != 8:
                raise NotImplementedError(f"PNG: bit depth {depth}")
            if color not in (0, 2, 6):
                raise NotImplementedError(f"PNG: color type {color}")
            if interlace != 0:
                raise NotImplementedError("PNG: interlaced (Adam7)")
            bpp = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:  # zlib.error is NOT a ValueError — a file
        # truncated at a chunk boundary (empty/partial IDAT) must still
        # honor the malformed→ValueError contract the extractors catch
        raise ValueError(f"PNG: bad deflate stream ({ex})") from ex
    if len(raw) != h * (1 + w * bpp):
        raise ValueError("PNG: decompressed size mismatch")
    px = _png_unfilter(raw, h, w, bpp).reshape(h, w, bpp)
    if bpp == 1:
        return np.repeat(px, 3, axis=2)
    return px[..., :3]  # RGBA: alpha dropped (decode contract is RGB)


def encode_png(img) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes, rotating the scanline filter
    (row y uses type y % 5) so a decode of anything taller than 4 rows
    exercises the FULL filter bank — the encoder exists to make
    deterministic fixtures that prove the decoder, not to compress."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[0], img.shape[1]
    bpp = 3
    z = np.zeros(bpp, dtype=np.int32)
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        a = np.concatenate([z, cur[:-bpp]]) if w * bpp > bpp else \
            np.zeros_like(cur)
        f = y % 5
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - a) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            filt = (cur - ((a + prev) >> 1)) % 256
        else:
            c = np.concatenate([z, prev[:-bpp]]) if w * bpp > bpp else \
                np.zeros_like(prev)
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pr = np.where((pa <= pb) & (pa <= pc), a,
                          np.where(pb <= pc, prev, c))
            filt = (cur - pr) % 256
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def decode_image(payload: bytes):
    """REAL image decode, pure stdlib + numpy:

    * binary PPM (``P6``, maxval <= 255) — header tokens then raw RGB
    * uncompressed 24-bit BMP (``BM``, BITMAPINFOHEADER, BI_RGB) —
      bottom-up BGR rows padded to 4 bytes
    * PNG (8-bit gray/RGB/RGBA, non-interlaced) — stdlib zlib + numpy
      unfiltering (``_decode_png``)

    Other formats (JPEG/WebP/...) fall through to PIL when it is
    importable (optional dependency — deployment installs Pillow and
    this same function decodes everything); without PIL they raise
    ``NotImplementedError``. Malformed payloads of a recognized format
    raise ``ValueError``. Returns an (h, w, 3) uint8 RGB array.
    """
    import struct

    import numpy as np

    if payload[:2] == b"P6":
        # header: P6 <width> <height> <maxval>, tokens separated by
        # whitespace, '#' comments run to end-of-line
        pos, tokens = 2, []
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                nl = payload.find(b"\n", pos)
                pos = len(payload) if nl < 0 else nl + 1
                continue
            start = pos
            while (pos < len(payload)
                   and not payload[pos : pos + 1].isspace()):
                pos += 1
            if pos == start:
                raise ValueError("PPM: truncated header")
            tokens.append(payload[start:pos])
        pos += 1  # single whitespace after maxval, then raw samples
        w, h, maxval = (int(t) for t in tokens)
        if maxval > 255:
            raise NotImplementedError("PPM: 16-bit samples not supported")
        need = w * h * 3
        raster = payload[pos : pos + need]
        if len(raster) != need:
            raise ValueError("PPM: raster shorter than width*height*3")
        return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)

    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("BMP: truncated header")
        data_offset = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if hdr_size < 40:
            raise ValueError("BMP: pre-BITMAPINFOHEADER not supported")
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"BMP: only uncompressed 24-bit supported "
                f"(bpp={bpp}, compression={compression})")
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        need = stride * h
        raster = payload[data_offset : data_offset + need]
        if len(raster) != need:
            raise ValueError("BMP: raster shorter than stride*height")
        rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
        return img[::-1] if flip else img

    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(payload)

    # Optional-PIL seam: when Pillow is importable (deployment), any
    # remaining compressed codec (JPEG/WebP/TIFF/...) decodes here with
    # the same (h, w, 3) uint8 RGB contract; this container has no PIL,
    # so the seam is exercised in tests via an injected fake module.
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        Image = None
    if Image is not None:
        import io

        try:
            return np.asarray(
                Image.open(io.BytesIO(payload)).convert("RGB"))
        except Exception as ex:
            # PIL failures are UnidentifiedImageError/OSError/etc — none
            # a ValueError, so an unguarded raise would escape the
            # extractors' malformed-payload catch and kill the stage on
            # one corrupt blob. Normalize to the documented contract.
            raise ValueError(f"PIL decode failed ({ex})") from ex

    raise NotImplementedError(
        f"unrecognized/compressed image format (magic "
        f"{payload[:2]!r}); install Pillow to decode JPEG/WebP/... — "
        f"PPM, BMP and PNG decode without it")


def encode_ppm(img) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM bytes (the codec-free sink that
    pairs with decode_image — thumbnails survive a full round-trip)."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


IMAGE_FEATURE_SCHEMA = (
    "id bigint, width int, height int, mean_r double, mean_g double, "
    "mean_b double, decode_ok boolean"
)


def synthesize_png_payloads(df: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG fixture stream — real compressed payloads with
    CLOSED-FORM features, so a SQL oracle can check the decode:

    for each id, a (1 + id%8)-row × (1 + id%16)-col RGB gradient image
    with pixel (y, x) = (id%200 + x, (7*id)%200 + y, (13*id)%256) —
    no channel ever wraps (199 + 15 < 255), hence
    ``mean_r = id%200 + (width-1)/2``, ``mean_g = (7*id)%200 +
    (height-1)/2``, ``mean_b = (13*id)%256`` exactly. ``encode_png``
    rotates scanline filters per row, so decoding the corpus exercises
    every PNG filter type. Output: (id, payload binary)."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 1 + i % 16, 1 + i % 8
                ys = np.arange(h, dtype=np.int32)[:, None]
                xs = np.arange(w, dtype=np.int32)[None, :]
                img = np.stack(
                    [np.broadcast_to(i % 200 + xs, (h, w)),
                     np.broadcast_to((7 * i) % 200 + ys, (h, w)),
                     np.full((h, w), (13 * i) % 256, dtype=np.int32)],
                    axis=2).astype(np.uint8)
                payloads.append(encode_png(img))
            yield pd.DataFrame({"id": pdf[id_col], "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        build, schema="id bigint, payload binary")


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "id") -> DataFrame:
    """Pixel-level feature extraction over a binary image column — the
    REAL decode stage for PPM/BMP payloads: (id, width, height, per-channel
    means rounded to 4dp, decode_ok). Undecodable payloads (compressed
    formats, corrupt bytes) yield decode_ok=false with null features
    instead of failing the job — at 100 TB some shard ALWAYS has a bad
    blob, and one exception must not kill a 1000-executor stage."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": pdf[id_col], "width": [], "height": [],
                   "mean_r": [], "mean_g": [], "mean_b": [],
                   "decode_ok": []}
            for payload in pdf[payload_col]:
                try:
                    img = decode_image(payload or b"")
                    means = img.reshape(-1, 3).mean(axis=0)
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["mean_r"].append(round(float(means[0]), 4))
                    out["mean_g"].append(round(float(means[1]), 4))
                    out["mean_b"].append(round(float(means[2]), 4))
                    out["decode_ok"].append(True)
                except (NotImplementedError, ValueError, IndexError):
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_r"].append(None)
                    out["mean_g"].append(None)
                    out["mean_b"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, schema=IMAGE_FEATURE_SCHEMA)


def resize_decoded_images(df: DataFrame, width: int = 64, height: int = 64,
                          payload_col: str = "payload",
                          id_col: str = "id") -> DataFrame:
    """TRUE thumbnailer for decodable payloads: decode → nearest-neighbor
    resample in numpy → re-encode as PPM. Output (id, width, height,
    thumb binary, decode_ok); undecodable rows carry a null thumb. Same
    narrow-projection → mapInPandas shape as the production PIL stage."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": pdf[id_col], "width": width, "height": height,
                   "thumb": [], "decode_ok": []}
            for payload in pdf[payload_col]:
                try:
                    img = decode_image(payload or b"")
                    ys = (np.arange(height) * img.shape[0]) // height
                    xs = (np.arange(width) * img.shape[1]) // width
                    out["thumb"].append(encode_ppm(img[ys][:, xs]))
                    out["decode_ok"].append(True)
                except (NotImplementedError, ValueError, IndexError):
                    out["thumb"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        resize,
        schema="id bigint, width int, height int, thumb binary, "
               "decode_ok boolean")


def decode_features(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "id") -> DataFrame:
    """Arrow-batched feature extraction over a binary column via mapInPandas.

    The deterministic byte-level features (length, md5 digest, head bytes)
    stand in for decoded-media features; the UDF signature, batch iteration,
    and output schema are exactly what a real decoder stage uses.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "byte_len": payloads.map(len),
                    "digest": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "head_hex": payloads.map(lambda b: b[:4].hex()),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


MEDIA_META_SCHEMA = (
    "media_type string, codec string, width int, height int, "
    "duration_ms bigint, sample_rate int"
)


def with_media_metadata(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "id") -> DataFrame:
    """Attach a typed metadata struct next to the opaque payload.

    Real pipelines carry this from ingestion (container headers); here the
    fields are deterministically derived from the payload bytes so the
    schema, null-handling, and downstream filters are exercisable. Filtering
    on `meta.*` happens BEFORE any decode — Catalyst prunes the binary column
    out of scans that only touch metadata.
    """
    byte_len = F.octet_length(F.col(payload_col))
    return df.select(
        F.col(id_col),
        F.col(payload_col),
        F.struct(
            F.when(byte_len % 3 == 0, "image")
            .when(byte_len % 3 == 1, "audio")
            .otherwise("video").alias("media_type"),
            F.lit("stub").alias("codec"),
            (byte_len % 1920).cast("int").alias("width"),
            (byte_len % 1080).cast("int").alias("height"),
            (byte_len * 10).cast("bigint").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = "id bigint, width int, height int, thumb binary"


def resize_images(df: DataFrame, width: int = 64, height: int = 64,
                  payload_col: str = "payload", id_col: str = "id") -> DataFrame:
    """Arrow-batched resize stage: (id, width, height, thumb binary).

    The Spark plumbing (narrow projection → mapInPandas → binary output
    column) is exactly a production thumbnailer's; the pixel work is a
    deterministic stand-in (proportional byte sampling of the payload —
    codecs aren't available here; swap the inner function for
    PIL.Image.resize in deployment).
    """
    import pandas as pd

    target = width * height // 8  # stand-in thumb byte budget

    def fake_resize(payload: bytes) -> bytes:
        if not payload:
            return b""
        step = max(len(payload) // max(target, 1), 1)
        return payload[::step][:target]

    def resize(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf[id_col],
                "width": width,
                "height": height,
                "thumb": pdf[payload_col].map(fake_resize),
            })

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        resize, schema=RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, n_frames: int = 4,
                      id_col: str = "id") -> DataFrame:
    """Plan rows for frame sampling: one output row per (video, frame_idx).

    The explode happens BEFORE decode so Spark parallelizes per-frame work;
    the decode stage itself is the stubbed mapInPandas above in deployment.
    """
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    )


FRAME_SCHEMA = "id bigint, frame_idx int, frame_ms bigint, frame binary"


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 32,
                  payload_col: str = "payload",
                  duration_col: str = "duration_ms",
                  id_col: str = "id") -> DataFrame:
    """Video frame sampling: one output row per sampled frame —
    (id, frame_idx, frame_ms, frame binary).

    The 1-to-MANY decode shape (each input row explodes into a bounded
    number of frame rows inside the Arrow batch) — structurally different
    from the 1-to-1 feature/resize stages and the shape a real pyav
    keyframe sampler uses. Frame payloads are deterministic byte slices
    (codecs unavailable here); ``max_frames`` bounds the explosion so one
    10-hour video can't balloon a task's output.

    At 100 TB: sample BEFORE any shuffle (this is a mapInPandas over the
    scan) and write frames out partitioned by frame_ms bucket if the
    downstream is time-aligned training.
    """

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "frame_idx": [], "frame_ms": [], "frame": []}
            for _, row in pdf.iterrows():
                payload = row[payload_col] or b""
                duration = int(row[duration_col] or 0)
                n = min(max(duration // every_ms, 1 if payload else 0),
                        max_frames)
                for i in range(n):
                    lo = len(payload) * i // max(n, 1)
                    hi = len(payload) * (i + 1) // max(n, 1)
                    out["id"].append(row[id_col])
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["frame"].append(payload[lo:hi])
            yield pd.DataFrame(out)

    cols = [F.col(id_col), F.col(payload_col), F.col(duration_col)]
    return df.select(*cols).mapInPandas(explode_frames, schema=FRAME_SCHEMA)
