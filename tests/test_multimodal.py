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


def test_png_roundtrip_exact_all_filters():
    """decode(synthesize(id)) must reproduce the closed-form pixels
    exactly for ids covering every (width, height) combination — and
    since filter type = row % 5 with h >= 5, every PNG filter
    (None/Sub/Up/Average/Paeth) is exercised in every image."""
    from sparkstreamingstateful_spark.functions.multimodal import (
        decode_png,
        png_dims,
        png_pixel,
        synthesize_png,
    )

    for doc_id in range(15):  # 15 covers all (w,h) = (5 widths × 3 heights)
        w, h, mr, mg, mb, tr, tg, tb = decode_png(synthesize_png(doc_id))
        ew, eh = png_dims(doc_id)
        assert (w, h) == (ew, eh)
        pix = [png_pixel(doc_id, x, y) for y in range(eh) for x in range(ew)]
        n = len(pix)
        for got, c in ((mr, 0), (mg, 1), (mb, 2)):
            assert got == sum(p[c] for p in pix) / n
        assert (tr, tg, tb) == png_pixel(doc_id, 0, 0)


def test_png_crc_validation():
    """A flipped byte anywhere in a chunk must fail the CRC check loudly
    — silent corruption tolerance is how image pipelines rot."""
    import pytest

    from sparkstreamingstateful_spark.functions.multimodal import (
        decode_png,
        synthesize_png,
    )

    blob = bytearray(synthesize_png(7))
    blob[40] ^= 0x01  # inside the IDAT payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_png_rejects_unsupported_variants():
    import struct
    import zlib

    import pytest

    from sparkstreamingstateful_spark.functions.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    # grayscale (color type 0) must be rejected, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    blob = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(bytes(6))
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(blob)


def test_wav_roundtrip_exact_and_chunk_walk():
    """decode_wav recovers exact params/stats from synthesize_wav bytes
    for a doc sample covering mono+stereo, all four rates and the junk
    LIST-chunk layout (doc_id % 3 == 0) — a reader assuming the
    canonical 44-byte layout mis-seeks the data chunk on those."""
    from sparkstreamingstateful_spark.functions.multimodal import (
        decode_wav,
        synthesize_wav,
        wav_params,
        wav_sample,
    )

    for doc_id in range(12):
        n, ch, rate = wav_params(doc_id)
        got = decode_wav(synthesize_wav(doc_id))
        ch0 = [wav_sample(doc_id, 0, i) for i in range(n)]
        allv = [wav_sample(doc_id, c, i) for i in range(n) for c in range(ch)]
        assert got[:4] == (ch, rate, n, ch0[0]), (doc_id, got)
        assert got[4] == sum(ch0) / n
        assert got[5] == max(abs(v) for v in allv)
        assert got[6] == (sum(v * v for v in ch0) / n) ** 0.5


def test_wav_rejections():
    """Non-PCM and non-16-bit variants must fail loudly, not mis-decode;
    bad magic is a ValueError."""
    import struct

    import pytest

    from sparkstreamingstateful_spark.functions.multimodal import (
        decode_wav,
        synthesize_wav,
    )

    good = synthesize_wav(1)
    with pytest.raises(ValueError):
        decode_wav(b"JUNK" + good[4:])
    # flip the fmt tag to 3 (IEEE float) — fmt chunk starts at offset 20
    mut = bytearray(good)
    fmt_off = good.index(b"fmt ") + 8
    struct.pack_into("<H", mut, fmt_off, 3)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(mut))


def test_jpeg_ac_path_hand_crafted_scan():
    """decode_jpeg's AC run-length path (never hit by the DC-exact
    corpus files) pinned with a hand-built 8x8 single-block scan
    carrying DC + two AC coefficients (one behind a ZRL run): the
    decoded block must equal an independent numpy IDCT of the same
    dequantized coefficient matrix."""
    import numpy as np
    import struct

    from sparkstreamingstateful_spark.functions.multimodal import (
        _AC_BITS,
        _AC_VALS,
        _BitWriter,
        _DC_BITS,
        _DC_VALS,
        _ZIGZAG,
        decode_jpeg,
        _huff_codes,
    )

    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    # DC = 5 (category 3)
    bw.put(*dc_codes[3]); bw.put(5, 3)
    # AC at zigzag k=1: value -3 (size 2, run 0) -> RS 0x02, bits = -3 + 3 = 0
    bw.put(*ac_codes[0x02]); bw.put(0, 2)
    # ZRL (16 zeros) then at k=18: value 7 (size 3, run 0 after ZRL)
    bw.put(*ac_codes[0xF0])
    bw.put(*ac_codes[0x03]); bw.put(7, 3)
    bw.put(*ac_codes[0x00])  # EOB
    scan = bw.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    q = bytes([8] * 64)
    blob = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0x00]) + q)
        + seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        + seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    w, h, mean, tl, mn, mx = decode_jpeg(blob)
    assert (w, h) == (8, 8)

    zz = np.zeros(64)
    zz[0], zz[1], zz[18] = 5, -3, 7
    coef = np.zeros(64)
    coef[_ZIGZAG] = zz * 8.0
    xs = np.arange(8)
    A = np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16) / 2.0
    A[0, :] /= np.sqrt(2.0)
    block = np.clip(np.rint(A.T @ coef.reshape(8, 8) @ A + 128), 0, 255)
    assert tl == int(block[0, 0])
    assert mean == float(block.sum() / 64)
    assert (mn, mx) == (int(block.min()), int(block.max()))


def test_jpeg_rejections():
    """Progressive SOF2 and multi-component files must fail loudly."""
    import struct

    import pytest

    from sparkstreamingstateful_spark.functions.multimodal import (
        decode_jpeg,
        synthesize_jpeg,
    )

    good = synthesize_jpeg(3)
    with pytest.raises(ValueError):
        decode_jpeg(b"XX" + good[2:])
    # flip SOF0 -> SOF2 (progressive)
    mut = bytearray(good)
    i = good.index(b"\xff\xc0")
    mut[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(mut))
