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
