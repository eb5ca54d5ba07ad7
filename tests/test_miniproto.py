"""Vendored mini-protobuf runtime (vendor/miniproto): wire-format
round-trips and descriptor parsing for the exact message shapes the
transformWithStateInPandas state clients exchange with the JVM.  The
end-to-end JVM interop is covered by
tests/test_streaming.py::test_transform_with_state_map_state_counts;
these tests pin the wire-level invariants the interop depends on."""

from __future__ import annotations

import pytest

from databox_adls_loader_spark.vendor import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip(
    "pyspark.sql.streaming.proto.StateMessage_pb2",
    reason="StateMessage_pb2 needs a protobuf runtime (real or vendored)")


def test_nested_oneof_roundtrip():
    cmd = sm.StateCallCommand(stateName="counts", schema="int")
    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getMapState=cmd))
    rt = sm.StateRequest()
    rt.ParseFromString(msg.SerializeToString())
    assert rt.statefulProcessorCall.getMapState.stateName == "counts"
    assert rt.statefulProcessorCall.getMapState.schema == "int"


def test_known_wire_bytes():
    # hand-decoded golden bytes: field 2 (statefulProcessorCall, LEN) ->
    # field 4 (getMapState, LEN) -> {stateName: "counts", schema: "int"}
    msg = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall(
        getMapState=sm.StateCallCommand(stateName="counts", schema="int")))
    assert msg.SerializeToString().hex() == \
        "120f220d0a06636f756e74731203696e74"


def test_negative_int64_ten_byte_varint():
    # protobuf encodes negative ints as 64-bit two's-complement varints
    neg = sm.RegisterTimer(expiryTimestampMs=-1)
    assert neg.SerializeToString().hex() == "08ffffffffffffffffff01"
    rt = sm.RegisterTimer()
    rt.ParseFromString(neg.SerializeToString())
    assert rt.expiryTimestampMs == -1


def test_enum_constants_and_roundtrip():
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    m = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)))
    rt = sm.StateRequest()
    rt.ParseFromString(m.SerializeToString())
    assert rt.statefulProcessorCall.setHandleState.state == sm.DATA_PROCESSED


def test_repeated_bytes_and_messages():
    ap = sm.AppendList(value=[b"a", b"bb", b"ccc"], fetchWithArrow=True)
    rt = sm.AppendList()
    rt.ParseFromString(ap.SerializeToString())
    assert list(rt.value) == [b"a", b"bb", b"ccc"]
    assert rt.fetchWithArrow is True

    resp = sm.StateResponseWithTimer(
        statusCode=0, requireNextFetch=True,
        timer=[sm.TimerInfo(key=b"k1", timestampMs=123),
               sm.TimerInfo(timestampMs=-5)])
    rt2 = sm.StateResponseWithTimer()
    rt2.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in rt2.timer] == \
        [(b"k1", 123), (b"", -5)]
    assert rt2.requireNextFetch is True


def test_proto3_defaults_absent_fields():
    rt = sm.StateResponse()
    rt.ParseFromString(b"")
    assert rt.statusCode == 0
    assert rt.errorMessage == ""
    assert rt.value == b""


def test_unknown_fields_skipped():
    # a future JVM may add fields; decoding must skip unknown tags of
    # every wire type without corrupting adjacent known fields
    from databox_adls_loader_spark.vendor.miniproto.google.protobuf import (
        _mini_runtime as mr)
    out = bytearray()
    mr._enc_varint(out, (1 << 3) | 0)        # statusCode = 7
    mr._enc_varint(out, 7)
    mr._enc_varint(out, (99 << 3) | 2)       # unknown LEN field
    mr._enc_varint(out, 3)
    out += b"xyz"
    mr._enc_varint(out, (98 << 3) | 5)       # unknown fixed32
    out += (0).to_bytes(4, "little")
    mr._enc_varint(out, (3 << 3) | 2)        # value = b"ok"
    mr._enc_varint(out, 2)
    out += b"ok"
    rt = sm.StateResponse()
    rt.ParseFromString(bytes(out))
    assert rt.statusCode == 7 and rt.value == b"ok"


def test_descriptor_parsing_matches_proto():
    d = sm.StateRequest.DESCRIPTOR
    assert d.fields_by_name["version"].number == 1
    assert d.fields_by_name["statefulProcessorCall"].number == 2
    assert d.fields_by_name["statefulProcessorCall"].message_type.name == \
        "StatefulProcessorCall"
    e = sm.SetHandleState.DESCRIPTOR.fields_by_name["state"]
    assert e.enum_type.name == "HandleState"
    assert sm.HandleState.Value("INITIALIZED") == 2
    assert sm.HandleState.Name(4) == "TIMER_PROCESSED"


def test_kwargs_none_means_unset():
    m = sm.StateCallCommand(stateName="x", ttl=None)
    assert m.SerializeToString() == sm.StateCallCommand(
        stateName="x").SerializeToString()
