"""Wire-format codec operators (SURVEY.md §2.1 ingest surface).

The sandbox ships neither the spark-protobuf jar nor a network to fetch
it, so the JVM ``from_protobuf``/``to_protobuf`` column functions are
environment-blocked (recorded honestly since r7). What IS closable
offline is the wire level: the repo already vendors a clean-room protobuf
runtime (vendor/google/protobuf, built from the public encoding spec at
protobuf.dev/programming-guides/encoding) for the transformWithState
state-server protocol — this module reuses its wire primitives to run a
full encode→decode protobuf round trip through Spark, H-checked per row
against the source table. A deployment with the jar would swap the
mapInArrow stages for ``to_protobuf``/``from_protobuf`` columns; the
framing produced here (varint-length-delimited proto3 messages) is
exactly what Kafka/stream consumers hand those functions.

Scale posture: the codec is two narrow ``mapInArrow`` stages — encode
packs each incoming Arrow batch into ONE delimited blob row, decode
unpacks blob rows batch-parallel — so the whole round trip is
scan → mapInArrow → mapInArrow with ZERO shuffles; blobs stay on the
partitions that produced them. Per-row Python exists only inside the
Arrow batch loop (the irreducible cost of a byte-level codec without the
jar; Arrow moves the columns in bulk either way).
"""

from __future__ import annotations

import importlib.util
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..compat import VENDOR_DIR
from ..registry import query

# Proto3 message shape for one event (field numbers are the contract the
# oracle-checked round trip pins):
#   1 event_id  int64  VARINT     2 user_id  int64  VARINT
#   3 event_type string LEN       4 value    double I64
#   5 ts_us     int64  VARINT     9 <extra>  int64  VARINT (decoder skips)
# Field 9 is deliberately UNKNOWN to the decoder: proto3 readers must
# skip fields they don't know (forward compatibility), and encoding one
# proves skip_field runs on the hot path, not just in unit tests.


def _load_wire():
    """Resolve the vendored wire module on a worker.

    When the vendored runtime owns ``google.protobuf`` (this sandbox),
    the normal import works via the PYTHONPATH propagation compat.py
    already does for TWS. When a REAL protobuf install wins the import
    race, it has no ``internal.wire`` — fall back to loading the vendor
    file directly by path, so the codec works under either runtime."""
    try:
        from google.protobuf.internal import wire  # type: ignore

        if hasattr(wire, "decode_varint"):
            return wire
    except ImportError:
        pass
    path = os.path.join(VENDOR_DIR, "google", "protobuf", "internal", "wire.py")
    spec = importlib.util.spec_from_file_location("sss_vendor_wire", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod


def _encode_event_batches(it):
    import pyarrow as pa

    wire = _load_wire()
    pack_d = struct.Struct("<d").pack
    for batch in it:
        cols = {n: batch.column(i).to_pylist() for i, n in enumerate(batch.schema.names)}
        out = bytearray()
        n = batch.num_rows
        for i in range(n):
            msg = bytearray()
            # proto3 implicit presence: zero-valued scalars are omitted
            # (the decoder's defaults restore them — round-trip exact).
            eid = cols["event_id"][i]
            if eid:
                wire.encode_tag(msg, 1, wire.VARINT)
                wire.encode_varint(msg, eid)
            uid = cols["user_id"][i]
            if uid:
                wire.encode_tag(msg, 2, wire.VARINT)
                wire.encode_varint(msg, uid)
            et = cols["event_type"][i]
            if et:
                wire.encode_len(msg, 3, et.encode("utf-8"))
            val = cols["value"][i]
            if val != 0.0:
                wire.encode_tag(msg, 4, wire.I64)
                msg += pack_d(val)
            ts = cols["ts_us"][i]
            if ts:
                wire.encode_tag(msg, 5, wire.VARINT)
                wire.encode_varint(msg, ts)
            # forward-compat probe: a field this repo's decoder never
            # learned — it must be skipped, not break framing
            wire.encode_tag(msg, 9, wire.VARINT)
            wire.encode_varint(msg, eid % 7)
            wire.encode_varint(out, len(msg))
            out += msg
        yield pa.record_batch(
            [pa.array([bytes(out)], pa.binary()), pa.array([n], pa.int64())],
            names=["blob", "n_msgs"],
        )


def _decode_event_batches(it):
    import pyarrow as pa

    wire = _load_wire()
    unpack_d = struct.Struct("<d").unpack_from
    for batch in it:
        ids, users, types, vals, tss = [], [], [], [], []
        for blob in batch.column(0).to_pylist():
            pos, total = 0, len(blob)
            while pos < total:
                mlen, pos = wire.decode_varint(blob, pos)
                end = pos + mlen
                eid = uid = ts = 0
                et, val = "", 0.0
                while pos < end:
                    num, wt, pos = wire.decode_tag(blob, pos)
                    if num == 1 and wt == wire.VARINT:
                        v, pos = wire.decode_varint(blob, pos)
                        eid = wire.to_signed(v, 64)
                    elif num == 2 and wt == wire.VARINT:
                        v, pos = wire.decode_varint(blob, pos)
                        uid = wire.to_signed(v, 64)
                    elif num == 3 and wt == wire.LEN:
                        ln, pos = wire.decode_varint(blob, pos)
                        et = bytes(blob[pos : pos + ln]).decode("utf-8")
                        pos += ln
                    elif num == 4 and wt == wire.I64:
                        val = unpack_d(blob, pos)[0]
                        pos += 8
                    elif num == 5 and wt == wire.VARINT:
                        v, pos = wire.decode_varint(blob, pos)
                        ts = wire.to_signed(v, 64)
                    else:
                        pos = wire.skip_field(blob, pos, wt)
                ids.append(eid)
                users.append(uid)
                types.append(et)
                vals.append(val)
                tss.append(ts)
        yield pa.record_batch(
            [
                pa.array(ids, pa.int64()),
                pa.array(users, pa.int64()),
                pa.array(types, pa.string()),
                pa.array(vals, pa.float64()),
                pa.array(tss, pa.int64()),
            ],
            names=["event_id", "user_id", "event_type", "value", "ts_us"],
        )


@query(
    "codec_protobuf_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type, value,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM events
    """,
)
def codec_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protobuf wire-format round trip over the events table: every row
    is encoded as a proto3 message (varint ints, LEN string, I64 double,
    implicit presence — zero values omitted and restored by decoder
    defaults), messages are varint-length-delimited into one blob per
    Arrow batch, and a second mapInArrow stage parses the blobs back to
    typed rows. The encoder also writes a field number the decoder has
    never seen, so unknown-field skipping (proto3 forward compatibility)
    runs on every message. The H-check compares the decoded rows
    PER ROW against the source table — any framing slip, varint
    mis-decode, sign error, or dropped field shifts the hash. Doubles
    survive exactly (IEEE-754 bytes on the wire); ts travels as epoch
    micros, matching the oracle's epoch_us.

    Null contract: the events table carries no NULLs (all six columns
    fully populated at every shipped SF); proto3 scalars cannot express
    NULL, so a nullable source would need wrapper/optional fields —
    out of scope for this wire-level key and stated rather than hidden.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    blobs = ev.mapInArrow(_encode_event_batches, "blob binary, n_msgs long")
    return blobs.mapInArrow(
        _decode_event_batches,
        "event_id long, user_id long, event_type string, value double, ts_us long",
    )
