"""Multimodal (image/audio/video) column support (SURVEY.md §2.11 L8).

Design: media travels as an opaque ``binary`` column plus typed metadata
(modality, byte size, magic-prefix format sniff) — the lakehouse-standard
layout for multimodal training data. Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each partition streams through Python in
constant memory; at 100 TB the only knobs are partition sizing
(``maxPartitionBytes`` vs media row size) and keeping metadata filters
(modality, size, format) *ahead* of the decode stage so pruning happens on
the cheap columns.

The actual codec calls (PIL/librosa/ffmpeg) are NOT available in this
container, so ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested — the Spark-side plumbing (schema,
UDF signature, Arrow batch shape, partitioning) is real and tested either
way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# magic-byte prefixes for format sniffing (public file-format signatures)
MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "wav-or-avi",
    b"ID3": "mp3",
    b"\x00\x00\x00\x18": "mp4",
}

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def sniff_format(data: bytes) -> str:
    for magic, fmt in MAGIC.items():
        if data[: len(magic)] == magic:
            return fmt
    return "unknown"


def decode_media(data: bytes, modality: str, *, fake: bool = False) -> list[float]:
    """Decode one media blob to a FEATURE_DIM feature vector.

    Real decoding needs codec libraries absent from this container —
    ``fake=True`` selects the deterministic stand-in (sha256-seeded), which
    keeps every downstream shape (schema, batch layout, partitioning)
    identical to production.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/librosa/ffmpeg) are not installed; "
            "pass fake=True for the deterministic stand-in decoder"
        )
    h = hashlib.sha256(data).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def resize_media(data: bytes, width: int, height: int, *, fake: bool = False) -> bytes:
    """Resize one image/video-frame blob to (width, height).

    Real resizing needs PIL/ffmpeg (absent here) — ``fake=True`` selects a
    deterministic stand-in (content+dims-seeded bytes of plausible size)
    that keeps downstream schema/batch shapes production-identical."""
    if not fake:
        raise NotImplementedError(
            "image codecs (PIL/ffmpeg) are not installed; "
            "pass fake=True for the deterministic stand-in resizer"
        )
    seed = hashlib.sha256(data + f"{width}x{height}".encode()).digest()
    # deterministic pseudo-pixels, 1 byte per pixel (grayscale stand-in)
    out = (seed * (width * height // len(seed) + 1))[: width * height]
    return bytes(out)


FRAME_BYTES = 256  # fake-codec frame size (fixed-size chunks of the blob)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("sampled_hashes", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, *, every_n: int = 3) -> DataFrame:
    """Video frame sampling via Arrow-batched ``mapInPandas``: treat each
    blob as fixed-size frames, keep every ``every_n``-th, emit per-doc
    frame counts + the sampled frames' sha256 fingerprints (a string, so
    the output is driver-canonicalizer-safe). The deterministic chunking
    stands in for a real ffmpeg keyframe decode; the Spark-side plumbing
    (schema, batch iteration, constant per-partition memory) is the
    production shape. Input needs columns (doc_id, media: binary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames, n_sampled, hashes = [], [], []
            for blob in (bytes(b) for b in pdf["media"]):
                frames = [
                    blob[i : i + FRAME_BYTES]
                    for i in range(0, len(blob), FRAME_BYTES)
                ]
                sampled = frames[::every_n]
                n_frames.append(len(frames))
                n_sampled.append(len(sampled))
                hashes.append(
                    ",".join(hashlib.sha256(f).hexdigest() for f in sampled)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": n_frames,
                    "n_sampled": n_sampled,
                    "sampled_hashes": hashes,
                }
            )

    return df.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def extract_features(df: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """binary column → typed metadata + feature vector via mapInPandas.

    Input needs columns (doc_id, modality, media: binary). Output
    FEATURE_SCHEMA. One Arrow batch in, one out — constant memory per
    partition regardless of row count.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(b) for b in blobs],
                    "format": [sniff_format(b) for b in blobs],
                    "feature": [decode_media(b, m, fake=fake_decode)
                                for b, m in zip(blobs, pdf["modality"])],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


# ----------------------------------------------------------------- BMP
# The one REAL decode path in this container: uncompressed 24-bit BMP is
# a pure-struct public format (Windows BITMAPINFOHEADER layout), so it
# needs no codec library. synthesize_bmp builds genuine BMP files from a
# closed-form pixel function (so a SQL oracle can replay the expected
# stats without parsing bytes); decode_bmp parses ONLY the bytes —
# header fields, row padding, bottom-up row order, BGR channel order —
# exactly what any conformant reader must do. The NotImplementedError
# gates above still cover every compressed format.

BMP_HEADER_BYTES = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def bmp_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-doc dimensions: widths 2..6 (3*w % 4 covers every
    pad width 0..3, so stride handling is genuinely exercised), heights
    2..4 (h >= 2 so bottom-up order is observable)."""
    return 2 + doc_id % 5, 2 + doc_id % 3


def bmp_pixel(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Closed-form (B, G, R) for pixel (x, y) — integer arithmetic only,
    replayed verbatim by the oracle SQL."""
    return (
        (doc_id + 2 * x + 5 * y) % 256,
        (2 * doc_id + 3 * x + y) % 256,
        (3 * doc_id + x + 4 * y) % 256,
    )


def synthesize_bmp(doc_id: int) -> bytes:
    """One valid uncompressed 24-bit BMP: positive height => rows stored
    BOTTOM-UP, each row padded to a 4-byte boundary, channels BGR."""
    import struct

    w, h = bmp_dims(doc_id)
    stride = (3 * w + 3) // 4 * 4
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            row += bytes(bmp_pixel(doc_id, x, y))
        row += b"\x00" * (stride - 3 * w)
        rows.append(bytes(row))
    pixels = b"".join(rows)
    header = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_BYTES + len(pixels), 0, 0, BMP_HEADER_BYTES
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + dib + pixels


def decode_bmp(data: bytes):
    """Parse one BMP from bytes alone: returns (width, height, mean_b,
    mean_g, mean_r, tl_b, tl_g, tl_r) where tl_* is the TOP-LEFT visual
    pixel — in a bottom-up file that's the LAST stored row, so a decoder
    that ignores row order returns the wrong corner (means alone are
    order-blind). Handles both height signs; rejects non-24bpp and
    compressed variants loudly."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    w, h_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP is supported")
    h = abs(h_raw)
    stride = (3 * w + 3) // 4 * 4
    px = (
        np.frombuffer(data, np.uint8, count=stride * h, offset=pix_off)
        .reshape(h, stride)[:, : 3 * w]
        .reshape(h, w, 3)
    )
    if h_raw > 0:  # bottom-up storage: flip so px[0] is the top row
        px = px[::-1]
    means = px.reshape(-1, 3).astype(np.float64).mean(axis=0)
    tl = px[0, 0]
    return w, h, float(means[0]), float(means[1]), float(means[2]), int(tl[0]), int(tl[1]), int(tl[2])


BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("tl_b", T.LongType()),
        T.StructField("tl_g", T.LongType()),
        T.StructField("tl_r", T.LongType()),
    ]
)


def decode_bmp_stats(df: DataFrame) -> DataFrame:
    """(doc_id, media: binary) → per-image stats via Arrow-batched
    mapInPandas, consuming ONLY the bytes (the decode stage never sees
    the generation arithmetic — that's what makes the oracle replay an
    independent check of the parser)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [decode_bmp(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [o[0] for o in out],
                    "height": [o[1] for o in out],
                    "n_pixels": [o[0] * o[1] for o in out],
                    "mean_b": [o[2] for o in out],
                    "mean_g": [o[3] for o in out],
                    "mean_r": [o[4] for o in out],
                    "tl_b": [o[5] for o in out],
                    "tl_g": [o[6] for o in out],
                    "tl_r": [o[7] for o in out],
                }
            )

    return df.mapInPandas(run, BMP_STATS_SCHEMA)
