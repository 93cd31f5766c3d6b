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


def decode_image(payload: bytes):
    """REAL image decode for codec-free container formats, pure numpy:

    * binary PPM (``P6``, maxval <= 255) — header tokens then raw RGB
    * uncompressed 24-bit BMP (``BM``, BITMAPINFOHEADER, BI_RGB) —
      bottom-up BGR rows padded to 4 bytes

    Returns an (h, w, 3) uint8 RGB array. Anything else raises
    ``NotImplementedError`` (compressed codecs need PIL — see
    ``decode_image_stub``); malformed payloads of a recognized format
    raise ``ValueError``.
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

    raise NotImplementedError(
        f"unrecognized/compressed image format (magic "
        f"{payload[:2]!r}); plug a codec library into decode_image_stub")


def encode_ppm(img) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM bytes (the codec-free sink that
    pairs with decode_image — thumbnails survive a full round-trip)."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


IMAGE_FEATURE_SCHEMA = (
    "id bigint, width int, height int, mean_r double, mean_g double, "
    "mean_b double, decode_ok boolean"
)


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
