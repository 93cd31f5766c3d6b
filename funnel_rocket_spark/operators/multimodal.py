"""Multimodal (image/audio/video) column plumbing.

Media payloads ride as opaque ``binary`` columns with typed metadata columns
next to them. The Spark-side machinery here is real and tested — schemas,
Arrow-batched ``mapInPandas`` decode stage, partition-size guidance. The
codec layer is split honestly in two:

* REAL decode, pure stdlib + numpy, no codec library: binary PPM (P6),
  uncompressed 24-bit BMP, PNG (stdlib zlib + scanline unfiltering, r9;
  since r11 the FULL static profile — 1/2/4/8/16-bit, gray/RGB/palette/
  gray+alpha/RGBA, Adam7 interlacing)
  and baseline JPEG (markers/Huffman/dequant/IDCT/upsampling, r10 —
  validated pixel-level against the independent JVM ImageIO decoder),
  all through ``decode_image``, with pixel-level feature extraction
  (``decode_image_features``) and a true nearest-neighbor thumbnailer
  (``resize_decoded_images``) built on top.
* HONEST SEAMS for the rest (progressive/12-bit/CMYK JPEG, WebP,
  audio/video — PIL/torchaudio/pyav are not available in this
  environment): ``NotImplementedError`` where a real decoder plugs in
  (optional-PIL fall-through when installed), and ``decode_features``
  computes deterministic byte-level stand-ins.

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


_PNG_ADAM7 = [  # per-pass (x_start, y_start, x_step, y_step)
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]
# legal bit depths per color type (PNG spec table 11.1) — anything else
# in IHDR is a MALFORMED file (ValueError), not an unsupported profile
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}
_PNG_SPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # samples per pixel


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Reverse PNG scanline filtering (types 0-4) → (h, stride) uint8.

    ``stride`` is the filtered byte count per scanline (filter byte
    excluded); ``bpp`` is the filter's byte distance — bytes per complete
    pixel rounded up to 1 (so sub-byte depths filter at distance 1).
    Sub is a per-pixel cumulative sum (vectorized); Average/Paeth are
    inherently sequential in x (each byte needs the reconstructed left
    neighbor) so they loop — fine for the fixture-scale images this
    pure-python decoder exists for."""
    import numpy as np

    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp]
            rec = np.cumsum(cur.reshape(stride // bpp, bpp),
                            axis=0).reshape(-1) % 256
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


def _png_unpack(rec, ph: int, pw: int, spp: int, depth: int):
    """(ph, stride) unfiltered bytes → (ph, pw, spp) int32 raw samples.

    depth 8/16 are byte slices; sub-byte depths unpack MSB-first bits
    (np.unpackbits) and weigh each ``depth``-bit group — all vectorized
    across the whole pass, no per-row python loop."""
    import numpy as np

    if depth == 8:
        return rec[:, : pw * spp].astype(np.int32).reshape(ph, pw, spp)
    if depth == 16:
        hi = rec[:, 0 : 2 * pw * spp : 2].astype(np.int32)
        lo = rec[:, 1 : 2 * pw * spp : 2].astype(np.int32)
        return ((hi << 8) | lo).reshape(ph, pw, spp)
    bits = np.unpackbits(rec.astype(np.uint8), axis=1)[:, : pw * spp * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int32)
    return (bits.reshape(ph, pw * spp, depth) * weights).sum(
        axis=2, dtype=np.int32).reshape(ph, pw, spp)


def _decode_png(payload: bytes):
    """REAL PNG decode, stdlib-zlib + numpy — no codec library needed.

    Full static-image profile since r11: every legal IHDR combination —
    bit depths 1/2/4/8/16, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha) and 6 (RGBA) — both interlace methods (none and
    Adam7), all five scanline filters, CRC-verified chunks. Alpha is
    dropped (the decode contract is (h, w, 3) uint8 RGB); 16-bit samples
    scale with round-half-up ``(v*255 + 32767) // 65535``; sub-byte gray
    scales exactly (255 is divisible by 1, 3 and 15). Malformed streams
    — including spec-illegal depth/color combinations — raise
    ``ValueError``."""
    import struct
    import zlib

    import numpy as np

    pos, w, palette = len(_PNG_SIG), None, None
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
            if color not in _PNG_DEPTHS or depth not in _PNG_DEPTHS[color]:
                raise ValueError(
                    f"PNG: illegal depth/color combination ({depth}/{color})")
            if interlace not in (0, 1):
                raise ValueError(f"PNG: bad interlace method {interlace}")
            spp = _PNG_SPP[color]
        elif ctype == b"PLTE":
            if len(data) % 3 or not data:
                raise ValueError("PNG: bad PLTE length")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: missing IHDR")
    if color == 3 and palette is None:
        raise ValueError("PNG: palette image missing PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:  # zlib.error is NOT a ValueError — a file
        # truncated at a chunk boundary (empty/partial IDAT) must still
        # honor the malformed→ValueError contract the extractors catch
        raise ValueError(f"PNG: bad deflate stream ({ex})") from ex

    samples = np.zeros((h, w, spp), dtype=np.int32)
    fbpp = max(1, (spp * depth) // 8)
    off = 0
    passes = [(0, 0, 1, 1)] if interlace == 0 else _PNG_ADAM7
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty Adam7 pass contributes zero bytes
        stride = (pw * spp * depth + 7) // 8
        need = ph * (1 + stride)
        if off + need > len(raw):
            raise ValueError("PNG: decompressed size mismatch")
        rec = _png_unfilter(raw[off : off + need], ph, stride, fbpp)
        off += need
        samples[y0::dy, x0::dx] = _png_unpack(rec, ph, pw, spp, depth)
    if off != len(raw):
        raise ValueError("PNG: decompressed size mismatch")

    if color == 3:
        if int(samples.max(initial=0)) >= len(palette):
            raise ValueError("PNG: palette index out of range")
        return palette[samples[..., 0]]
    if depth < 8:  # gray only; 255/(2^d - 1) is exact for d in 1,2,4
        px = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    elif depth == 8:
        px = samples.astype(np.uint8)
    else:
        px = ((samples * 255 + 32767) // 65535).astype(np.uint8)
    if color in (0, 4):  # gray / gray+alpha: replicate, drop alpha
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]  # RGBA: alpha dropped (decode contract is RGB)


def _png_pack(samples, depth: int):
    """(ph, pw, spp) raw sample ints → (ph, stride) packed scanline bytes.

    depth 16 is big-endian byte pairs; sub-byte depths emit MSB-first
    bits and ``np.packbits`` pads each row to a byte boundary with zero
    bits — exactly the PNG row-padding rule."""
    import numpy as np

    ph = samples.shape[0]
    flat = samples.reshape(ph, -1).astype(np.int64)
    if depth == 8:
        return flat.astype(np.uint8)
    if depth == 16:
        out = np.empty((ph, flat.shape[1] * 2), dtype=np.uint8)
        out[:, 0::2] = (flat >> 8).astype(np.uint8)
        out[:, 1::2] = (flat & 0xFF).astype(np.uint8)
        return out
    bits = ((flat[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1)
    return np.packbits(bits.reshape(ph, -1).astype(np.uint8), axis=1)


def _png_filter_pass(packed, fbpp: int) -> bytes:
    """Filter one (sub-)image's packed scanlines, rotating the filter
    (row y of the pass uses type y % 5) so any fixture taller than 4
    rows exercises the FULL filter bank."""
    import numpy as np

    out = bytearray()
    stride = packed.shape[1]
    z = np.zeros(fbpp, dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(packed.shape[0]):
        cur = packed[y].astype(np.int32)
        a = np.concatenate([z, cur[:-fbpp]]) if stride > fbpp else \
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
            c = np.concatenate([z, prev[:-fbpp]]) if stride > fbpp else \
                np.zeros_like(prev)
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pr = np.where((pa <= pb) & (pa <= pc), a,
                          np.where(pb <= pc, prev, c))
            filt = (cur - pr) % 256
        out.append(f)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def _encode_png_ex(samples, color: int, depth: int, palette=None,
                   interlace: int = 0) -> bytes:
    """Fixture-minting encoder for EVERY legal PNG profile the decoder
    claims: ``samples`` is (h, w, spp) raw sample values (palette
    indices for color type 3) in [0, 2**depth); ``palette`` is (n, 3)
    uint8 for color type 3; ``interlace`` 1 writes Adam7 passes. Exists
    to prove the decoder with deterministic bytes, not to compress."""
    import struct
    import zlib

    import numpy as np

    samples = np.asarray(samples)
    if samples.ndim == 2:
        samples = samples[:, :, None]
    h, w, spp = samples.shape
    if color not in _PNG_DEPTHS or depth not in _PNG_DEPTHS[color]:
        raise ValueError(f"illegal depth/color combination {depth}/{color}")
    if spp != _PNG_SPP[color]:
        raise ValueError(f"color type {color} needs {_PNG_SPP[color]} "
                         f"samples/pixel, got {spp}")
    fbpp = max(1, (spp * depth) // 8)
    raw = bytearray()
    passes = [(0, 0, 1, 1)] if interlace == 0 else _PNG_ADAM7
    for x0, y0, dx, dy in passes:
        sub = samples[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw.extend(_png_filter_pass(_png_pack(sub, depth), fbpp))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if color == 3:
        out += chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(
        b"IEND", b"")


def encode_png(img) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes, rotating the scanline filter
    (row y uses type y % 5) so a decode of anything taller than 4 rows
    exercises the FULL filter bank — the encoder exists to make
    deterministic fixtures that prove the decoder, not to compress."""
    return _encode_png_ex(img, color=2, depth=8)


# --------------------------------------------------------------------------- #
# Baseline JPEG (ITU T.81 / ISO 10918-1), pure stdlib + numpy — the r9 PNG
# codec proved library-free codecs are tractable; this closes the JPEG seam
# the optional-PIL path left untestable in this container. Supported profile:
# baseline DCT (SOF0), 8-bit, Huffman-coded, 1 or 3 components, any
# sampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...), restart intervals.
# Progressive (SOF2), arithmetic coding, 12-bit and CMYK stay honest
# ``NotImplementedError`` seams. The encoder exists to mint deterministic
# fixtures that prove the decoder (like ``encode_png``), writing the
# standard Annex-K Huffman tables into DHT segments — decode never assumes
# them, it always reads the tables from the file.

_JPEG_ZIGZAG = [  # k-th zigzag coefficient -> raster index
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU T.81 Annex K.3 typical Huffman tables: (bits[1..16], values).
_STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
_STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])


def _dct8_matrix():
    """Orthonormal 8-point DCT-II matrix T: coef = T @ block @ T.T,
    block = T.T @ coef @ T — one pair of 8x8 GEMMs per block, exact
    inverse in float64 far below the quantizer's integer grid."""
    import numpy as np

    k = np.arange(8)
    T = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    T[0] *= 1.0 / np.sqrt(2.0)
    return T


def _huff_decode_map(bits, vals):
    """Canonical Huffman (T.81 C.2): {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_map(bits, vals):
    """Canonical Huffman, encoder direction: {symbol: (code, length)}."""
    return {sym: (code, length)
            for (length, code), sym in _huff_decode_map(bits, vals).items()}


class _JpegBitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment —
    accumulator-based (bulk byte refills, no per-bit loop)."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _ensure(self, k: int) -> None:
        while self.n < k and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8

    def peek16(self) -> int:
        """Next 16 bits MSB-first, zero-padded past stream end (skip()
        still refuses to CONSUME past the end, preserving the truncated-
        stream ValueError contract)."""
        self._ensure(16)
        if self.n >= 16:
            return (self.acc >> (self.n - 16)) & 0xFFFF
        return (self.acc << (16 - self.n)) & 0xFFFF

    def skip(self, k: int) -> None:
        self._ensure(k)
        if self.n < k:
            raise ValueError("JPEG: entropy data exhausted")
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def receive(self, k: int) -> int:
        if k == 0:
            return 0
        self._ensure(k)
        if self.n < k:
            raise ValueError("JPEG: entropy data exhausted")
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v


# (bits, vals) -> 65536-entry (symbol, length) lookup: one table-driven
# probe per Huffman symbol instead of a per-bit tree walk (~3× decode
# throughput). Built once per DISTINCT table contents and cached — a
# corpus encoded with one DHT set (the common case, and our fixtures)
# pays the build once per executor, not per payload.
_HUFF_LUT_CACHE: dict = {}


def _huff_lut(bits, vals):
    key = (tuple(bits), tuple(vals))
    lut = _HUFF_LUT_CACHE.get(key)
    if lut is None:
        if len(_HUFF_LUT_CACHE) >= 64:  # runaway-table backstop
            _HUFF_LUT_CACHE.clear()
        lut = [None] * 65536
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                base = code << (16 - length)
                entry = (vals[k], length)
                for i in range(1 << (16 - length)):
                    lut[base + i] = entry
                code += 1
                k += 1
            code <<= 1
        _HUFF_LUT_CACHE[key] = lut
    return lut


def _huff_read_symbol(reader: _JpegBitReader, lut: list) -> int:
    e = lut[reader.peek16()]
    if e is None:
        raise ValueError("JPEG: invalid Huffman code")
    reader.skip(e[1])
    return e[0]


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: size-bit magnitude -> signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_segments(data: bytes, pos: int):
    """Unstuff the scan's entropy bytes, split at RSTn markers.

    Returns (segments, pos_after_scan). 0xFF00 unstuffs to a literal
    0xFF; RST0-7 delimit restart intervals; any other marker ends the
    scan."""
    segs, cur, i = [], bytearray(), pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = data[i + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif nxt == 0xFF:  # fill byte
            i += 1
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _decode_jpeg_progressive(payload: bytes):
    """Progressive JPEG (SOF2) decode: spectral-selection + successive-
    approximation scans accumulate per-component COEFFICIENT arrays
    (DC first/refine, AC first with EOB runs, AC refine with correction
    bits), then one dequant + IDCT pass renders the final image — the
    remaining common JPEG profile after r10's baseline decoder.
    Validated against the JVM ImageIO decoder on real files."""
    import struct

    import numpy as np

    qtables: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, list] = {}
    huff_ac: dict[int, list] = {}
    comps = None
    height = width = None
    ri = 0
    scans = []  # (scan_comp_ids, per-comp (dc_lut, ac_lut), Ss, Se, Ah, Al, ri, segs)
    i = 2
    n = len(payload)
    while i + 2 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        if marker == 0xFF:
            i += 1
            continue
        if i + 4 > n:
            raise ValueError("JPEG: truncated segment")
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        seg = payload[i + 4 : i + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG: truncated segment")
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant table")
                qtables[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _huff_lut(bits, vals)
                p += 17 + nv
        elif marker == 0xC2:
            if len(seg) < 6 or len(seg) < 6 + 3 * seg[5]:
                raise ValueError("JPEG: short SOF segment")
            if seg[0] != 8:
                raise NotImplementedError(f"JPEG: {seg[0]}-bit precision")
            height, width = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG: {nc} components (CMYK?)")
            comps = [{"id": seg[6 + 3 * c],
                      "h": seg[7 + 3 * c] >> 4, "v": seg[7 + 3 * c] & 15,
                      "tq": seg[8 + 3 * c]} for c in range(nc)]
        elif marker == 0xCC:
            raise NotImplementedError("JPEG: arithmetic coding (DAC)")
        elif marker == 0xDD:
            (ri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            if comps is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            sel = []
            for s in range(ns):
                cid = seg[1 + 2 * s]
                td, ta = seg[2 + 2 * s] >> 4, seg[2 + 2 * s] & 15
                sel.append((cid, huff_dc.get(td), huff_ac.get(ta)))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            segs, i = _entropy_segments(payload, i + 2 + seglen)
            scans.append((sel, ss, se, ahal >> 4, ahal & 15, ri, segs))
            continue
        i += 2 + seglen
    if comps is None or not scans:
        raise ValueError("JPEG: missing SOS/SOF")
    if height == 0 or width == 0:
        raise ValueError("JPEG: zero dimensions (DNL not supported)")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        c["bw_pad"], c["bh_pad"] = mcux * c["h"], mcuy * c["v"]
        # true (unpadded) block dims for non-interleaved scans (T.81 A.2.2)
        cw = -(-width * c["h"] // hmax)
        ch_ = -(-height * c["v"] // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-ch_ // 8)
        # coefficients stored in ZIGZAG order (the scan's native order;
        # finalization maps zigzag -> raster once, together with the
        # zigzag-ordered quant table)
        c["coef"] = np.zeros((c["bh_pad"], c["bw_pad"], 64), dtype=np.int64)
        c["pred"] = 0

    zig = _JPEG_ZIGZAG
    for sel, ss, se, ah, al, scan_ri, segs in scans:
        scomps = []
        for cid, dc_lut, ac_lut in sel:
            if cid not in by_id:
                raise ValueError("JPEG: scan references unknown component")
            scomps.append((by_id[cid], dc_lut, ac_lut))
        for c, _d, _a in scomps:
            c["pred"] = 0
        seg_idx = 0
        reader = _JpegBitReader(segs[0])
        eobrun = 0
        units = 0  # MCUs (interleaved) or blocks (single-component)

        def restart_if_due():
            nonlocal seg_idx, reader, eobrun, units
            if scan_ri and units and units % scan_ri == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("JPEG: missing restart segment")
                reader = _JpegBitReader(segs[seg_idx])
                eobrun = 0
                for c, _d, _a in scomps:
                    c["pred"] = 0

        if ss == 0:  # DC scan (interleaved or single-component)
            if se != 0:
                raise ValueError("JPEG: DC scan with Se != 0")
            interleaved = len(scomps) > 1

            def dc_block(c, dc_lut, by, bx):
                blk = c["coef"][by, bx]
                if ah == 0:
                    if dc_lut is None:
                        raise ValueError("JPEG: scan references undefined DHT")
                    s = _huff_read_symbol(reader, dc_lut)
                    if s > 11:
                        raise ValueError("JPEG: DC size > 11")
                    c["pred"] += _extend(reader.receive(s), s)
                    blk[0] = c["pred"] << al
                else:
                    if reader.receive(1):
                        blk[0] = int(blk[0]) | (1 << al)

            if interleaved:
                for my in range(mcuy):
                    for mx in range(mcux):
                        restart_if_due()
                        units += 1
                        for c, dc_lut, _a in scomps:
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    dc_block(c, dc_lut,
                                             my * c["v"] + by,
                                             mx * c["h"] + bx)
            else:
                c, dc_lut, _a = scomps[0]
                for by in range(c["bh"]):
                    for bx in range(c["bw"]):
                        restart_if_due()
                        units += 1
                        dc_block(c, dc_lut, by, bx)
            continue

        # AC scan: always single-component (T.81 B.2.3)
        if len(scomps) != 1:
            raise ValueError("JPEG: interleaved AC scan")
        c, _d, ac_lut = scomps[0]
        if ac_lut is None:
            raise ValueError("JPEG: scan references undefined DHT")
        p1, m1 = 1 << al, -1 << al
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                restart_if_due()
                units += 1
                blk = c["coef"][by, bx]
                if ah == 0:  # first pass for this band
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _huff_read_symbol(reader, ac_lut)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.receive(r)
                                break
                            k += 16
                            continue
                        k += r
                        if k > se:
                            raise ValueError("JPEG: AC index overflow")
                        blk[k] = _extend(
                            reader.receive(s), s) << al
                        k += 1
                else:  # refinement pass
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _huff_read_symbol(reader, ac_lut)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r < 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.receive(r)
                                    break
                                val = 0  # ZRL: skip 16 zero-history slots
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "JPEG: bad refinement size")
                                val = p1 if reader.receive(1) else m1
                            while k <= se:
                                cur = int(blk[k])
                                if cur != 0:
                                    if reader.receive(1) and not (cur & p1):
                                        blk[k] = cur + (
                                            p1 if cur >= 0 else m1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if s and k <= se:
                                blk[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            cur = int(blk[k])
                            if cur != 0:
                                if reader.receive(1) and not (cur & p1):
                                    blk[k] = cur + (
                                        p1 if cur >= 0 else m1)
                            k += 1
                        eobrun -= 1

    # finalize: dequant + IDCT every padded block, upsample, color
    T = _dct8_matrix()
    zz = np.array(zig)
    full = []
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError("JPEG: component references undefined DQT")
        qt = qtables[c["tq"]].astype(np.float64)
        plane = np.zeros((c["bh_pad"] * 8, c["bw_pad"] * 8))
        deq = np.zeros(64)
        for by in range(c["bh_pad"]):
            for bx in range(c["bw_pad"]):
                deq[zz] = c["coef"][by, bx] * qt
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = \
                    T.T @ deq.reshape(8, 8) @ T + 128.0
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(plane[:height, :width])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    Y, Cb, Cr = full
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)),
                   0, 255).astype(np.uint8)


def _decode_jpeg(payload: bytes):
    """REAL baseline JPEG decode — markers, Huffman, dequant, IDCT,
    chroma upsampling, YCbCr→RGB. Returns (h, w, 3) uint8 RGB (grayscale
    replicates, like ``_decode_png``). Unsupported JPEG *profiles*
    raise ``NotImplementedError``; malformed streams ``ValueError``."""
    import struct

    import numpy as np

    qtables: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None  # list of dicts: id, h, v, tq
    height = width = None
    restart_interval = 0
    i = 2  # past SOI
    n = len(payload)
    scan = None
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            # parameterless markers (SOI/TEM/RSTn): no length field
            i += 2
            continue
        if marker == 0xD9:  # EOI before SOS: no image data
            break
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        seg = payload[i + 4 : i + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG: truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant table")
                qtables[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _huff_lut(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / extended seq.
            if len(seg) < 6 or len(seg) < 6 + 3 * seg[5]:
                raise ValueError("JPEG: short SOF segment")
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG: {prec}-bit precision")
            height, width = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG: {nc} components (CMYK?)")
            comps = [{"id": seg[6 + 3 * c],
                      "h": seg[7 + 3 * c] >> 4, "v": seg[7 + 3 * c] & 15,
                      "tq": seg[8 + 3 * c]} for c in range(nc)]
        elif marker == 0xC2:
            return _decode_jpeg_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: non-baseline SOF (0xFF{marker:02X})")
        elif marker == 0xCC:
            raise NotImplementedError("JPEG: arithmetic coding (DAC)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = [{"id": seg[1 + 2 * s], "td": seg[2 + 2 * s] >> 4,
                     "ta": seg[2 + 2 * s] & 15} for s in range(ns)]
            i = i + 2 + seglen
            break
        # APPn / COM / others: skipped
        i += 2 + seglen
    if scan is None or comps is None:
        raise ValueError("JPEG: missing SOS/SOF")
    if height == 0 or width == 0:
        raise ValueError("JPEG: zero dimensions (DNL not supported)")
    segs, _end = _entropy_segments(payload, i)

    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan]
    for c, s in zip(order, scan):
        c["dc"] = huff_dc.get(s["td"])
        c["ac"] = huff_ac.get(s["ta"])
        if c["dc"] is None or c["ac"] is None:
            raise ValueError("JPEG: scan references undefined DHT")
        if c["tq"] not in qtables:
            raise ValueError("JPEG: component references undefined DQT")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("JPEG: zero sampling factor")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    T = _dct8_matrix()
    planes = {c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]),
                                dtype=np.float64) for c in comps}
    pred = {c["id"]: 0 for c in comps}

    seg_idx = 0
    reader = _JpegBitReader(segs[0])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("JPEG: missing restart segment")
                reader = _JpegBitReader(segs[seg_idx])
                mcu_in_seg = 0
                for c in comps:
                    pred[c["id"]] = 0
            mcu_in_seg += 1
            for c in order:
                qt = qtables[c["tq"]]
                plane = planes[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        s = _huff_read_symbol(reader, c["dc"])
                        if s > 11:
                            raise ValueError("JPEG: DC size > 11")
                        diff = _extend(reader.receive(s), s)
                        pred[c["id"]] += diff
                        raster = np.zeros(64, dtype=np.float64)
                        raster[0] = pred[c["id"]] * int(qt[0])
                        k = 1
                        while k < 64:
                            rs = _huff_read_symbol(reader, c["ac"])
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            raster[_JPEG_ZIGZAG[k]] = _extend(
                                reader.receive(size), size) * int(qt[k])
                            k += 1
                        block = T.T @ raster.reshape(8, 8) @ T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = block

    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    Y, Cb, Cr = full
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)),
                   0, 255).astype(np.uint8)


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:  # pad with 1-bits (T.81 F.1.2.3)
            self.write(1, 1)


def _size_category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _encode_block(writer, coef_zz, pred, dc_map, ac_map):
    """One quantized 64-coef block (zigzag order) -> bitstream."""
    diff = int(coef_zz[0]) - pred
    s = _size_category(diff)
    code, length = dc_map[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_map[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _size_category(v)
        code, length = ac_map[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac_map[0x00]  # EOB
        writer.write(code, length)
    return int(coef_zz[0])


def _encode_jpeg_planes(planes, height, width, sampling, qtables,
                        restart_interval: int = 0) -> bytes:
    """Core JPEG writer over component PLANES (values 0-255, already in
    the target color space): ``planes[i]`` has shape (ceil(h*v_i/vmax),
    ceil(w*h_i/hmax)) padded by the caller to full MCUs. ``sampling`` =
    [(h_i, v_i)], ``qtables`` = one or two 64-entry zigzag-order arrays
    (luma, chroma). Baseline, interleaved, standard Annex-K Huffman;
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exists chiefly so the decoder's restart path has a real
    bitstream to prove itself against)."""
    import struct

    import numpy as np

    nc = len(planes)
    T = _dct8_matrix()
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    def pad_plane(p, bh, bw):
        py = bh * 8 - p.shape[0]
        px = bw * 8 - p.shape[1]
        if py or px:
            p = np.pad(p, ((0, py), (0, px)), mode="edge")
        return p.astype(np.float64)

    padded = [pad_plane(np.asarray(p), mcuy * v, mcux * h)
              for p, (h, v) in zip(planes, sampling)]

    out = bytearray(b"\xff\xd8")  # SOI
    qts = [np.asarray(q, dtype=np.int32) for q in qtables]
    for tq, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in q)
    # SOF0
    sof = struct.pack(">BHHB", 8, height, width, nc)
    for ci, (h, v) in enumerate(sampling):
        tq = 0 if ci == 0 else min(1, len(qts) - 1)
        sof += bytes([ci + 1, (h << 4) | v, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT x (2 or 4)
    tables = [(0, 0, _STD_DC_LUMA), (1, 0, _STD_AC_LUMA)]
    if nc > 1:
        tables += [(0, 1, _STD_DC_CHROMA), (1, 1, _STD_AC_CHROMA)]
    for tc, th, (bits, vals) in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1 if nc > 1 else 0
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_maps = [_huff_encode_map(*_STD_DC_LUMA)]
    ac_maps = [_huff_encode_map(*_STD_AC_LUMA)]
    if nc > 1:
        dc_maps.append(_huff_encode_map(*_STD_DC_CHROMA))
        ac_maps.append(_huff_encode_map(*_STD_AC_CHROMA))
    zz = np.array(_JPEG_ZIGZAG)
    writer = _JpegBitWriter()
    pred = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                writer.flush()  # byte-align, then the restart marker
                out_marker = bytes([0xFF, 0xD0 + rst])
                writer.out.extend(out_marker)
                rst = (rst + 1) % 8
                pred = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                h, v = sampling[ci]
                qt = qts[0 if ci == 0 else min(1, len(qts) - 1)]
                ti = 0 if ci == 0 else min(1, nc - 1)
                for by in range(v):
                    for bx in range(h):
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = T @ (block - 128.0) @ T.T
                        coef_zz = np.round(
                            coef.reshape(64)[zz] / qt).astype(np.int64)
                        pred[ci] = _encode_block(
                            writer, coef_zz, pred[ci],
                            dc_maps[ti], ac_maps[ti])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# libjpeg Annex-K base quantization tables (quality scaling below)
_JPEG_BASE_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_BASE_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]


def _quality_qt(base, quality: int):
    import numpy as np

    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (np.array(base, dtype=np.int64)[np.array(_JPEG_ZIGZAG)]
         * scale + 50) // 100
    return np.clip(q, 1, 255)


def encode_jpeg(img, quality: int = 90, subsample: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) gray) → baseline JPEG bytes.
    ``subsample``: "444" (no chroma subsampling) or "420". Like
    ``encode_png``, this exists to mint deterministic fixtures proving
    the decoder — lossy round-trip error is bounded by the quantizer
    (tests pin it), not zero."""
    import numpy as np

    img = np.asarray(img)
    if img.ndim == 2:
        h, w = img.shape
        return _encode_jpeg_planes(
            [img], h, w, [(1, 1)], [_quality_qt(_JPEG_BASE_QT_LUMA,
                                                quality)])
    h, w = img.shape[0], img.shape[1]
    rgb = img.astype(np.float64)
    y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
        + 0.5 * rgb[..., 2]
    cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
        - 0.081312 * rgb[..., 2]
    y, cb, cr = (np.round(p) for p in (y, cb, cr))
    if subsample == "420":
        # 2x2 box-average chroma on an edge-padded even grid
        def down(p):
            pe = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                        mode="edge")
            return np.round((pe[0::2, 0::2] + pe[0::2, 1::2]
                             + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0)

        return _encode_jpeg_planes(
            [y, down(cb), down(cr)], h, w, [(2, 2), (1, 1), (1, 1)],
            [_quality_qt(_JPEG_BASE_QT_LUMA, quality),
             _quality_qt(_JPEG_BASE_QT_CHROMA, quality)])
    if subsample != "444":
        raise ValueError(f"subsample must be 444 or 420: {subsample!r}")
    return _encode_jpeg_planes(
        [y, cb, cr], h, w, [(1, 1), (1, 1), (1, 1)],
        [_quality_qt(_JPEG_BASE_QT_LUMA, quality),
         _quality_qt(_JPEG_BASE_QT_CHROMA, quality)])


def _try_pil():
    """The optional-PIL import, one place: the Image module when Pillow
    is installed (deployment / test-injected fake), else None."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


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

    if payload[:2] == b"\xff\xd8":
        try:
            return _decode_jpeg(payload)
        except NotImplementedError:
            # unsupported JPEG PROFILE (progressive/12-bit/CMYK/
            # arithmetic): fall through to the optional-PIL seam below;
            # re-raised there when PIL is absent. Malformed baseline
            # streams stay ValueError (no second decode attempt).
            if _try_pil() is None:
                raise

    # Optional-PIL seam: when Pillow is importable (deployment), any
    # remaining compressed codec (WebP/TIFF/progressive-JPEG/...)
    # decodes here with the same (h, w, 3) uint8 RGB contract; this
    # container has no PIL, so the seam is exercised in tests via an
    # injected fake module.
    Image = _try_pil()
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


AUDIO_SPECTRAL_SCHEMA = (
    "id bigint, n_samples bigint, dominant_bin int, dominant_freq_hz double, "
    "spectral_centroid_hz double, decode_ok boolean"
)


def audio_spectral_features(df: DataFrame, payload_col: str = "payload",
                            id_col: str = "id") -> DataFrame:
    """Frequency-domain audio features over a binary WAV column: one
    rfft per payload (mono mixdown), reporting the dominant non-DC bin,
    its frequency, and the spectral centroid over non-DC bins — the
    map-only FFT stage every audio-quality or music/speech gate builds
    on. Same decode_ok degrade path as the sample-domain extractor."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": pdf[id_col], "n_samples": [], "dominant_bin": [],
                   "dominant_freq_hz": [], "spectral_centroid_hz": [],
                   "decode_ok": []}
            for payload in pdf[payload_col]:
                try:
                    x, sr = decode_wav(bytes(payload or b""))
                    mono = x.mean(axis=1)
                    if len(mono) < 2:
                        raise ValueError("too short for a spectrum")
                    mag = np.abs(np.fft.rfft(mono))
                    freqs = np.fft.rfftfreq(len(mono), d=1.0 / sr)
                    m, f = mag[1:], freqs[1:]  # DC excluded
                    k = int(np.argmax(m)) + 1
                    tot = float(m.sum())
                    cen = float((f * m).sum() / tot) if tot > 0 else 0.0
                    out["n_samples"].append(len(mono))
                    out["dominant_bin"].append(k)
                    out["dominant_freq_hz"].append(
                        round(float(freqs[k]), 4))
                    out["spectral_centroid_hz"].append(round(cen, 2))
                    out["decode_ok"].append(True)
                except (NotImplementedError, ValueError, IndexError):
                    for key in ("n_samples", "dominant_bin",
                                "dominant_freq_hz", "spectral_centroid_hz"):
                        out[key].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, schema=AUDIO_SPECTRAL_SCHEMA)


def synthesize_tone_wav_payloads(df: DataFrame,
                                 id_col: str = "doc_id") -> DataFrame:
    """WAV fixture with a CLOSED-FORM spectrum: a pure period-4 tone
    ``tile([a, 0, -a, 0])`` (every sample ±a or 0 — exact in 16-bit
    PCM; ``a`` odd like the square-wave fixture) whose DFT is a single
    line at bin n/4. Hence dominant_bin = n/4, dominant_freq =
    spectral_centroid = sr/4 exactly — an oracle that actually checks
    the FFT put the energy where the algebra says (a broken transform
    misplaces the argmax). n = 64·(1+i%8), sr = 8000·(1+i%3), a =
    (101 + 2·(i%450))/32768."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                a = (101 + 2 * (i % 450)) / 32768.0
                n_samp = 64 * (1 + i % 8)
                sr = 8000 * (1 + i % 3)
                wave = np.tile([a, 0.0, -a, 0.0], n_samp // 4)
                payloads.append(encode_wav(wave, sr))
            yield pd.DataFrame({"id": pdf[id_col], "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        build, schema="id bigint, payload binary")



def _spread_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Round-robin the id column across the session's default
    parallelism before a per-payload Python codec stage: the fixture
    corpora live in ONE small parquet file, and without this the whole
    encode+decode chain serializes into a single task (measured: the
    JPEG query ran 1-task at 4.8 s; spread, it tracks cores). Real
    deployments reading many files get this for free from the scan."""
    sc = df.sparkSession.sparkContext
    return df.select(F.col(id_col)).repartition(sc.defaultParallelism)


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

    return _spread_ids(df, id_col).mapInPandas(
        build, schema="id bigint, payload binary")


def synthesize_jpeg_payloads(df: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """Deterministic JPEG fixture stream — real baseline 4:2:0 payloads
    with CLOSED-FORM features, the lossy-codec twin of
    ``synthesize_png_payloads``. Exactness argument: each image is a
    grid of CONSTANT 8x8 luma tiles (a constant block's DCT is pure DC
    = 8·(v−128); with every quantizer entry 8 the quantized DC is the
    integer v−128, zero rounding), and chroma is constant 128 (all
    coefficients 0; Cb=Cr=128 makes the decoder's YCbCr→RGB the
    identity), so the decode is BIT-EXACT despite the lossy format and
    a SQL oracle can state the means in closed form:

    for id i, (1 + i%3) x (1 + i%5) tiles of 8x8 px — tile (r, c) has
    gray value (i%179) + 4r + 2c (max 194, never wraps) — hence
    ``width = 8·(1 + i%5)``, ``height = 8·(1 + i%3)``, and
    ``mean_r = mean_g = mean_b = (i%179) + 2·(i%3) + (i%5)`` exactly.
    Every payload still exercises the full baseline path: 3-component
    interleaved MCUs, 2x2 luma sampling, Huffman DC diffs across tiles,
    EOB, dequant, IDCT, upsampling, color transform. (Non-constant
    blocks round-trip only within the quantizer bound — those AC paths
    are pinned by pytest, not the oracle.)"""
    import numpy as np

    q8 = [8] * 64

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                ht, wt = 1 + i % 3, 1 + i % 5
                h, w = 8 * ht, 8 * wt
                tiles = ((i % 179)
                         + 4 * np.arange(ht, dtype=np.float64)[:, None]
                         + 2 * np.arange(wt, dtype=np.float64)[None, :])
                y_plane = np.kron(tiles, np.ones((8, 8)))
                c_plane = np.full((-(-h // 2), -(-w // 2)), 128.0)
                payloads.append(_encode_jpeg_planes(
                    [y_plane, c_plane, c_plane], h, w,
                    [(2, 2), (1, 1), (1, 1)], [q8, q8]))
            yield pd.DataFrame({"id": pdf[id_col], "payload": payloads})

    return _spread_ids(df, id_col).mapInPandas(
        build, schema="id bigint, payload binary")



# --------------------------------------------------------------------------- #
# Audio: PCM WAV is a codec-free container (RIFF chunks + raw samples) — the
# audio twin of PPM/BMP, decoded for REAL in pure stdlib + numpy. Compressed
# audio (MP3/AAC/OGG/FLAC) stays an honest NotImplementedError seam for
# torchaudio/pyav in deployment; the Spark-side stage (schema, Arrow
# batching, degrade path) is identical either way.


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM decode → (samples float64 in [-1, 1) shaped
    (n, channels), sample_rate). Supports 8/16/24/32-bit integer PCM
    (format 1) and 32/64-bit IEEE float (format 3), any channel count;
    compressed formats (MP3 inside WAV, ADPCM, …) raise
    ``NotImplementedError``; malformed payloads ``ValueError``."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("WAV: not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("WAV: truncated chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("WAV: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _brate, _align, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        raise NotImplementedError("WAV: extensible format")
    if audio_format not in (1, 3):
        raise NotImplementedError(
            f"WAV: compressed audio format {audio_format} "
            "(install torchaudio/pyav to decode)")
    if channels < 1:
        raise ValueError("WAV: zero channels")
    if audio_format == 3:
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"WAV: float PCM with {bits} bits")
    elif bits == 8:  # unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3).astype(np.uint32)
        v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        v = v.astype(np.int32)
        v[v >= (1 << 23)] -= 1 << 24
        x = v.astype(np.float64) / float(1 << 23)
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) \
            / float(1 << 31)
    else:
        raise ValueError(f"WAV: integer PCM with {bits} bits")
    frames = len(x) // channels
    return x[: frames * channels].reshape(frames, channels), sample_rate


def encode_wav(samples, sample_rate: int) -> bytes:
    """(n,) or (n, channels) float in [-1, 1] → 16-bit PCM WAV bytes —
    the fixture-minting twin of ``decode_wav`` (like ``encode_png``)."""
    import struct

    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.reshape(-1).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


AUDIO_FEATURE_SCHEMA = (
    "id bigint, sample_rate int, channels int, n_samples bigint, "
    "duration_ms bigint, rms double, peak double, zero_crossings bigint, "
    "decode_ok boolean"
)


def decode_audio_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "id") -> DataFrame:
    """Sample-level audio features over a binary WAV column — the REAL
    audio decode stage: per-payload (sample_rate, channels, n_samples,
    duration_ms, rms, peak, zero_crossings), with the same
    decode_ok=false degrade path as the image extractors (a corrupt or
    compressed blob must not kill the stage). rms/peak are over the
    mono mixdown (channel mean), rounded to 6dp; zero_crossings counts
    strict sign changes."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": pdf[id_col], "sample_rate": [], "channels": [],
                   "n_samples": [], "duration_ms": [], "rms": [],
                   "peak": [], "zero_crossings": [], "decode_ok": []}
            for payload in pdf[payload_col]:
                try:
                    x, sr = decode_wav(bytes(payload or b""))
                    mono = x.mean(axis=1)
                    out["sample_rate"].append(sr)
                    out["channels"].append(x.shape[1])
                    out["n_samples"].append(x.shape[0])
                    out["duration_ms"].append(
                        x.shape[0] * 1000 // sr if sr else 0)
                    out["rms"].append(
                        round(float(np.sqrt(np.mean(mono ** 2))), 6)
                        if len(mono) else 0.0)
                    out["peak"].append(
                        round(float(np.abs(mono).max()), 6)
                        if len(mono) else 0.0)
                    s = np.sign(mono)
                    s = s[s != 0]
                    out["zero_crossings"].append(
                        int(np.sum(s[1:] != s[:-1])) if len(s) else 0)
                    out["decode_ok"].append(True)
                except (NotImplementedError, ValueError, IndexError):
                    for k in ("sample_rate", "channels", "n_samples",
                              "duration_ms", "rms", "peak",
                              "zero_crossings"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, schema=AUDIO_FEATURE_SCHEMA)


def synthesize_wav_payloads(df: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV fixture stream with CLOSED-FORM features, the
    audio twin of ``synthesize_jpeg_payloads``: for id i, a square wave
    alternating ±a where ``a = (101 + 2·(i % 450))/32768`` — an ODD
    integer PCM value, which provably never lands on an exact 6-decimal
    rounding tie (a tie needs k·15625 ≡ 256 mod 512, impossible for odd
    k), so Python's round-half-even and SQL's round-half-away agree on
    every id. ``n = 64·(1 + i%8)`` samples (even → mean 0), mono,
    ``sample_rate = 8000·(1 + i%3)``. Hence rms = peak = a exactly
    (alternating ±a squares to the constant a²; IEEE sqrt of an exact
    square is exact), zero_crossings = n−1, duration_ms = n·1000 // sr
    — all closed-form for the SQL oracle."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                a = (101 + 2 * (i % 450)) / 32768.0
                n_samp = 64 * (1 + i % 8)
                sr = 8000 * (1 + i % 3)
                wave = np.where(np.arange(n_samp) % 2 == 0, a, -a)
                payloads.append(encode_wav(wave, sr))
            yield pd.DataFrame({"id": pdf[id_col], "payload": payloads})

    return _spread_ids(df, id_col).mapInPandas(
        build, schema="id bigint, payload binary")


# --------------------------------------------------------------------------- #
# Video: Y4M (yuv4mpeg2) is the codec-free video container — a text header
# plus raw planar YUV frames, the video twin of PPM/WAV. Decoded for REAL in
# pure numpy; compressed video (H.264/VP9/AV1) stays an honest
# NotImplementedError seam for pyav in deployment.


def decode_y4m(payload: bytes):
    """YUV4MPEG2 decode → (frames (n, h, w, 3) uint8 RGB, fps float).
    Supports C420/C420jpeg/C420mpeg2/C420paldv (chroma nearest-upsampled)
    and C444, full-range JPEG-style YCbCr→RGB (the same matrix as the
    JPEG decoder — Cb=Cr=128 is the identity on gray). Interlaced
    streams and other colorspaces raise ``NotImplementedError``;
    malformed streams ``ValueError``."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("Y4M: missing YUV4MPEG2 signature")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M: unterminated stream header")
    w = h = None
    fps = 30.0
    chroma = "420jpeg"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps = int(num) / max(int(den), 1)
        elif t[0] == "C":
            chroma = t[1:]
        elif t[0] == "I" and t[1:] not in ("p",):
            raise NotImplementedError(f"Y4M: interlaced ({t})")
    if not w or not h:
        raise ValueError("Y4M: missing W/H in stream header")
    if chroma.startswith("420"):
        if w % 2 or h % 2:
            raise ValueError("Y4M: odd dimensions with 420 chroma")
        cw, ch_ = w // 2, h // 2
    elif chroma == "444":
        cw, ch_ = w, h
    else:
        raise NotImplementedError(f"Y4M: colorspace C{chroma}")
    frame_bytes = w * h + 2 * cw * ch_

    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("Y4M: bad FRAME header")
        pos = fnl + 1
        raw = payload[pos : pos + frame_bytes]
        if len(raw) != frame_bytes:
            raise ValueError("Y4M: truncated frame")
        pos += frame_bytes
        y = np.frombuffer(raw[: w * h], dtype=np.uint8) \
            .reshape(h, w).astype(np.float64)
        cb = np.frombuffer(raw[w * h : w * h + cw * ch_], dtype=np.uint8) \
            .reshape(ch_, cw).astype(np.float64)
        cr = np.frombuffer(raw[w * h + cw * ch_ :], dtype=np.uint8) \
            .reshape(ch_, cw).astype(np.float64)
        if chroma.startswith("420"):
            cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
            cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        frames.append(np.clip(np.round(np.stack([r, g, b], axis=2)),
                              0, 255).astype(np.uint8))
    if not frames:
        raise ValueError("Y4M: no frames")
    return np.stack(frames), fps


def encode_y4m(frames, fps: int = 25) -> bytes:
    """(n, h, w, 3) uint8 RGB → Y4M bytes (C444, full-range JPEG YCbCr)
    — the fixture-minting twin of ``decode_y4m``."""
    import numpy as np

    x = np.asarray(frames, dtype=np.float64)
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    head = f"YUV4MPEG2 W{w} H{h} F{int(fps)}:1 Ip A1:1 C444\n".encode()
    out = bytearray(head)
    for f in range(n):
        rgb = x[f]
        y = np.round(0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                     + 0.114 * rgb[..., 2])
        cb = np.round(128.0 - 0.168736 * rgb[..., 0]
                      - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2])
        cr = np.round(128.0 + 0.5 * rgb[..., 0]
                      - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2])
        out += b"FRAME\n"
        for p in (y, cb, cr):
            out += np.clip(p, 0, 255).astype(np.uint8).tobytes()
    return bytes(out)


VIDEO_FRAME_SCHEMA = (
    "id bigint, frame_idx int, width int, height int, n_frames int, "
    "fps double, mean_r double, mean_g double, mean_b double, "
    "decode_ok boolean"
)


def decode_video_frames(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "id") -> DataFrame:
    """Per-FRAME pixel features over a binary Y4M column — the REAL
    video decode stage (1-to-many: one output row per frame), with the
    image extractors' decode_ok degrade path (an undecodable payload
    yields ONE decode_ok=false row, never a dead stage)."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("id", "frame_idx", "width", "height", "n_frames",
                     "fps", "mean_r", "mean_g", "mean_b", "decode_ok")}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames, fps = decode_y4m(bytes(payload or b""))
                except (NotImplementedError, ValueError, IndexError):
                    rows["id"].append(i)
                    rows["frame_idx"].append(None)
                    for k in ("width", "height", "n_frames", "fps",
                              "mean_r", "mean_g", "mean_b"):
                        rows[k].append(None)
                    rows["decode_ok"].append(False)
                    continue
                n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
                means = frames.reshape(n, -1, 3).mean(axis=1)
                for f in range(n):
                    rows["id"].append(i)
                    rows["frame_idx"].append(f)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_frames"].append(n)
                    rows["fps"].append(float(fps))
                    rows["mean_r"].append(round(float(means[f, 0]), 4))
                    rows["mean_g"].append(round(float(means[f, 1]), 4))
                    rows["mean_b"].append(round(float(means[f, 2]), 4))
                    rows["decode_ok"].append(True)
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, schema=VIDEO_FRAME_SCHEMA)


def synthesize_y4m_payloads(df: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Deterministic Y4M fixture stream with CLOSED-FORM per-frame
    features: for id i, ``1 + i%4`` frames of ``8·(1+i%3)`` ×
    ``8·(1+i%2)`` px, frame f a CONSTANT gray ``(i%200) + 10·f`` (max
    229, never clips; gray → Cb=Cr=128 exactly under the JPEG matrix,
    so YCbCr round-trips the value bit-for-bit). Hence every frame's
    mean_r = mean_g = mean_b = (i%200) + 10·f exactly — the SQL oracle
    restates it with a per-id frame series. fps fixed at 25."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                n, w, h = 1 + i % 4, 8 * (1 + i % 3), 8 * (1 + i % 2)
                frames = np.stack([
                    np.full((h, w, 3), (i % 200) + 10 * f, dtype=np.uint8)
                    for f in range(n)])
                payloads.append(encode_y4m(frames, fps=25))
            yield pd.DataFrame({"id": pdf[id_col], "payload": payloads})

    return _spread_ids(df, id_col).mapInPandas(
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
