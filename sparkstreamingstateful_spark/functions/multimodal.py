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
