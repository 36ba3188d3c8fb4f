"""Vendored minimal-protobuf runtime tests (vendor/google/protobuf).

Golden wire vectors below are hand-derived from the PUBLIC protobuf
encoding spec (protobuf.dev/programming-guides/encoding) and the state
protocol's field numbers — NOT produced by the implementation under test,
so an encoder and decoder that are wrong in the same way cannot pass.
The end-to-end proof (a real transformWithStateInPandas query whose
worker speaks this runtime to the JVM state server) lives in
test_streaming.py::test_tws_path_marker + the stateful_running_agg_tws
oracle row.
"""

from __future__ import annotations

import pytest

from sparkstreamingstateful_spark.compat import ensure_protobuf


@pytest.fixture(scope="module")
def sm():
    state = ensure_protobuf()
    assert state in ("native", "vendored"), state
    import pyspark.sql.streaming.proto.StateMessage_pb2 as mod

    return mod


def test_runtime_resolves():
    # native protobuf must always win when importable; the vendored shim
    # only fills a void (this container: no google package at all)
    assert ensure_protobuf() in ("native", "vendored")


def test_golden_set_handle_state(sm):
    # StateRequest.statefulProcessorCall = field 2 (LEN) -> tag 0x12
    # StatefulProcessorCall.setHandleState = field 1 (LEN) -> tag 0x0a
    # SetHandleState.state = field 1 (VARINT) -> tag 0x08, INITIALIZED=2
    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert msg.SerializeToString() == bytes.fromhex("12040a020802")


def test_golden_zero_enum_oneof_presence(sm):
    # PRE_INIT=0 is the enum default -> the inner varint is NOT emitted,
    # but the oneof member (setHandleState, empty payload) MUST be: the
    # JVM distinguishes "no call" from "call with default state" by the
    # presence of the length-delimited submessage record.
    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
        )
    )
    assert msg.SerializeToString() == bytes.fromhex("12020a00")
    back = sm.StateRequest()
    back.ParseFromString(bytes.fromhex("12020a00"))
    assert back.WhichOneof("method") == "statefulProcessorCall"
    assert back.statefulProcessorCall.WhichOneof("method") == "setHandleState"
    assert back.statefulProcessorCall.setHandleState.state == sm.PRE_INIT


def test_golden_negative_int64(sm):
    # int64 -1 -> 10-byte sign-extended varint: ff ff ff ff ff ff ff ff ff 01
    msg = sm.RegisterTimer(expiryTimestampMs=-1)
    assert msg.SerializeToString() == bytes.fromhex("08ffffffffffffffffff01")
    back = sm.RegisterTimer()
    back.ParseFromString(bytes.fromhex("08ffffffffffffffffff01"))
    assert back.expiryTimestampMs == -1


def test_golden_string_and_bytes(sm):
    # SetImplicitKey.key = field 1 (LEN bytes)
    msg = sm.SetImplicitKey(key=b"\x00\x01ab")
    assert msg.SerializeToString() == bytes.fromhex("0a04") + b"\x00\x01ab"
    # ListStateGet.iteratorId = field 1 (LEN utf-8)
    msg2 = sm.ListStateGet(iteratorId="it1")
    assert msg2.SerializeToString() == bytes.fromhex("0a03") + b"it1"


def test_unknown_fields_skipped(sm):
    # field 15 varint + field 14 LEN are not in StateResponse's schema;
    # a spec-compliant parser skips them and still reads statusCode=7
    payload = bytes.fromhex("7803") + bytes.fromhex("7202") + b"zz" + bytes.fromhex("0807")
    msg = sm.StateResponse()
    msg.ParseFromString(payload)
    assert msg.statusCode == 7


def test_repeated_and_bool_roundtrip(sm):
    put = sm.ListStatePut(value=[b"\x01", b"", b"abc"], fetchWithArrow=True)
    back = sm.ListStatePut()
    back.ParseFromString(put.SerializeToString())
    assert list(back.value) == [b"\x01", b"", b"abc"]
    assert back.fetchWithArrow is True
    # empty repeated + default bool serialize to nothing at all
    assert sm.ListStatePut().SerializeToString() == b""


def test_repeated_message_and_proto3_optional(sm):
    resp = sm.StateResponseWithTimer(
        statusCode=1,
        timer=[sm.TimerInfo(key=b"k", timestampMs=5), sm.TimerInfo(timestampMs=6)],
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.timestampMs, t.HasField("key")) for t in back.timer] == [
        (5, True),
        (6, False),
    ]
    assert back.timer[0].key == b"k"


def test_oneof_last_wins(sm):
    req = sm.ImplicitGroupingKeyRequest(setImplicitKey=sm.SetImplicitKey(key=b"x"))
    assert req.WhichOneof("method") == "setImplicitKey"
    req2 = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"x"),
    )
    # reparse a message whose wire carries BOTH members: last one wins
    both = (
        sm.ImplicitGroupingKeyRequest(setImplicitKey=sm.SetImplicitKey(key=b"x"))
        .SerializeToString()
        + sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        ).SerializeToString()
    )
    req2.ParseFromString(both)
    assert req2.WhichOneof("method") == "removeImplicitKey"


def test_submessage_vivify_presence(sm):
    # the exact pyspark client pattern: attribute-chain write into ttl
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    assert not cmd.HasField("ttl")
    _ = cmd.ttl.durationMs  # read-only access must NOT create presence
    assert not cmd.HasField("ttl")
    assert b"ttl" not in cmd.SerializeToString()  # no spurious record
    cmd.ttl.durationMs = 1234
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.HasField("ttl") and back.ttl.durationMs == 1234


def test_vivified_presence_survives_nesting(sm):
    # mutation three levels deep must mark every ancestor present
    req = sm.StateRequest()
    req.statefulProcessorCall.getValueState.stateName = "deep"
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "statefulProcessorCall"
    assert back.statefulProcessorCall.WhichOneof("method") == "getValueState"
    assert back.statefulProcessorCall.getValueState.stateName == "deep"


def test_unsupported_schema_features_fail_loud():
    # the pool refuses field types outside the implemented subset instead
    # of mis-encoding them: hand-build a FileDescriptorProto declaring a
    # double field (type 1). Layout per descriptor.proto field numbers.
    from sparkstreamingstateful_spark.compat import VENDOR_DIR
    import sys

    if VENDOR_DIR not in sys.path:
        pytest.skip("native protobuf active; pool-gate test is shim-specific")
    from google.protobuf import descriptor_pool
    from google.protobuf.internal import wire

    def ld(num, payload):
        out = bytearray()
        wire.encode_tag(out, num, wire.LEN)
        wire.encode_varint(out, len(payload))
        out.extend(payload)
        return bytes(out)

    def vint(num, v):
        out = bytearray()
        wire.encode_tag(out, num, wire.VARINT)
        wire.encode_varint(out, v)
        return bytes(out)

    field = ld(1, b"bad") + vint(3, 1) + vint(4, 1) + vint(5, 1)  # TYPE_DOUBLE
    msg = ld(1, b"M") + ld(2, field)
    fdp = ld(1, b"x/bad.proto") + ld(2, b"pkg") + ld(4, msg)
    with pytest.raises(NotImplementedError, match="minimal runtime"):
        descriptor_pool.DescriptorPool().AddSerializedFile(fdp)
