"""Multimodal (image/audio/video) column plumbing.

Media payloads ride as opaque ``binary`` columns with typed metadata columns
next to them. The Spark-side machinery here is real and tested — schemas,
Arrow-batched ``mapInPandas`` decode stage, partition-size guidance — while
the actual codec step is stubbed (image/audio libraries are not available in
this environment): ``decode_features`` computes deterministic byte-level
features, and ``decode_image_stub`` raises ``NotImplementedError`` where a
real decoder (PIL / torchaudio / pyav) would plug in.

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
    """Where a real image decode would go (PIL.Image.open → size/mode/EXIF).

    STUB: media codecs are not available in this environment.
    """
    raise NotImplementedError(
        "Image decoding requires PIL/torchvision — not available here. "
        "Swap this function for a real decoder in deployment."
    )


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
