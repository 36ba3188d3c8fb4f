"""Multimodal function-layer tests (L8): format sniffing, the gated codec
stub, the deterministic resizer, and frame-sampling edge shapes. The
mapInPandas plumbing itself is hash-checked end-to-end by the
multimodal_frame_sample / multimodal_features inventory keys."""

from __future__ import annotations

import hashlib

import pytest

from sparkstreamingstateful_spark.functions import multimodal as mm


def test_sniff_format_known_magics():
    assert mm.sniff_format(b"\x89PNGrest") == "png"
    assert mm.sniff_format(b"\xff\xd8\xff\xe0...") == "jpeg"
    assert mm.sniff_format(b"RIFF1234WAVE") == "wav-or-avi"
    assert mm.sniff_format(b"plain text") == "unknown"


def test_decode_media_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"xx", "image")
    v = mm.decode_media(b"xx", "image", fake=True)
    assert len(v) == mm.FEATURE_DIM
    assert v == mm.decode_media(b"xx", "image", fake=True)  # deterministic


def test_resize_media_stub():
    with pytest.raises(NotImplementedError):
        mm.resize_media(b"img", 4, 4)
    out = mm.resize_media(b"img", 8, 6, fake=True)
    assert len(out) == 8 * 6  # one stand-in byte per pixel
    assert out == mm.resize_media(b"img", 8, 6, fake=True)
    assert out != mm.resize_media(b"img", 6, 8, fake=True)  # dims in seed


def test_sample_frames_chunking(spark):
    # 600 bytes → frames [256, 256, 88]; every 3rd → frame 0 only
    blob = bytes(range(256)) * 2 + b"x" * 88
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, media binary")
    [row] = mm.sample_frames(df, every_n=3).collect()
    assert row["n_frames"] == 3
    assert row["n_sampled"] == 1
    assert row["sampled_hashes"] == hashlib.sha256(blob[:256]).hexdigest()
