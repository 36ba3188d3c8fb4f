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


def test_decode_bmp_top_down_and_rejections():
    """decode_bmp must honor a NEGATIVE height (top-down row order — the
    branch the synthesized corpus never takes) and reject non-BMP /
    non-24bpp input loudly instead of mis-parsing."""
    import struct

    import pytest

    src = mm.synthesize_bmp(11)
    w, h = mm.bmp_dims(11)
    # rewrite height to -h and reverse the stored rows: identical image
    stride = (3 * w + 3) // 4 * 4
    rows = [src[54 + i * stride : 54 + (i + 1) * stride] for i in range(h)]
    top_down = src[:22] + struct.pack("<i", -h) + src[26:54] + b"".join(rows[::-1])
    assert mm.decode_bmp(top_down) == mm.decode_bmp(src)

    with pytest.raises(ValueError):
        mm.decode_bmp(b"PNG not a bmp")
    bad_bpp = src[:28] + struct.pack("<H", 8) + src[30:]
    with pytest.raises(NotImplementedError):
        mm.decode_bmp(bad_bpp)
