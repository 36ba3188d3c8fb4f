"""Protobuf wire codec (codec_protobuf_roundtrip) edge cases the corpus
can't exercise: negative int64s (10-byte varints through to_signed),
proto3 zero-default omission, and the vendor-file fallback loader."""

import os

from pyspark.sql import functions as F


def test_codec_negative_and_default_roundtrip(spark):
    """Negative ids must survive the two's-complement varint path and
    zero-valued scalars must round-trip through proto3 implicit presence
    (omitted on the wire, restored by decoder defaults)."""
    from sparkstreamingstateful_spark.operators.codecs import (
        _decode_event_batches,
        _encode_event_batches,
    )

    df = spark.createDataFrame(
        [
            (-1, -(1 << 62), "late", -2.5, -123456789),
            (0, 0, "", 0.0, 0),  # all-default message: only field 9 on wire
            (7, 42, "purchase", 1.5, 1_700_000_000_000_000),
        ],
        "event_id long, user_id long, event_type string, value double, ts_us long",
    )
    blobs = df.mapInArrow(_encode_event_batches, "blob binary, n_msgs long")
    back = blobs.mapInArrow(
        _decode_event_batches,
        "event_id long, user_id long, event_type string, value double, ts_us long",
    )
    rows = sorted(back.collect(), key=lambda r: r["event_id"])
    assert [tuple(r) for r in rows] == [
        (-1, -(1 << 62), "late", -2.5, -123456789),
        (0, 0, "", 0.0, 0),
        (7, 42, "purchase", 1.5, 1_700_000_000_000_000),
    ]


def test_codec_wire_fallback_loader():
    """The by-path loader (used when a real protobuf install shadows the
    vendored tree) must yield a working wire module."""
    import importlib.util

    from sparkstreamingstateful_spark.compat import VENDOR_DIR

    path = os.path.join(VENDOR_DIR, "google", "protobuf", "internal", "wire.py")
    spec = importlib.util.spec_from_file_location("sss_vendor_wire_test", path)
    wire = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wire)
    buf = bytearray()
    wire.encode_varint(buf, -5)  # negatives mask to 64-bit → 10 bytes
    assert len(buf) == 10
    v, pos = wire.decode_varint(bytes(buf), 0)
    assert pos == 10 and wire.to_signed(v, 64) == -5


def test_codec_all_default_message_is_tiny(spark):
    """Implicit presence must actually shrink the wire: a fully-default
    row encodes to just the forward-compat probe field (2 bytes) plus its
    length prefix — pinning that the encoder doesn't serialize zeros."""
    from sparkstreamingstateful_spark.operators.codecs import _encode_event_batches

    df = spark.createDataFrame(
        [(0, 0, "", 0.0, 0)],
        "event_id long, user_id long, event_type string, value double, ts_us long",
    )
    blob = df.mapInArrow(_encode_event_batches, "blob binary, n_msgs long").collect()
    assert len(blob) == 1 and blob[0]["n_msgs"] == 1
    # varint len (1 byte: value 2) + tag(field 9, VARINT) + varint 0
    assert blob[0]["blob"] == bytes([2, 0x48, 0x00])
