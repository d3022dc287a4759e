"""Wire-format unit tests for streaming/proto_shim.py.

The e2e proof is tests/test_tws_alerts.py (a real
transformWithStateInPandas query against the JVM state server); these
tests pin the encoding details a refactor could silently break —
presence semantics for oneof arms, signed varints, repeated fields —
against hand-computed proto3 bytes (public encoding spec:
https://protobuf.dev/programming-guides/encoding/)."""

from __future__ import annotations

import sys

from finance_etl_pipeline_spark.streaming import proto_shim as pb


def test_scalar_and_string_encoding_matches_spec():
    # field 1 (string): tag 0x0A, len, utf8
    m = pb.StateCallCommand(stateName="spend")
    assert m.SerializeToString() == b"\x0a\x05spend"
    # int64 field 1 varint: RegisterTimer(expiryTimestampMs=300)
    t = pb.RegisterTimer(expiryTimestampMs=300)
    assert t.SerializeToString() == b"\x08\xac\x02"


def test_empty_oneof_arm_is_on_the_wire_but_untouched_child_is_not():
    # RemoveImplicitKey() is an EMPTY message, but as an explicitly set
    # oneof arm it must appear (tag field 2, length 0) so the JVM sees
    # which method was chosen
    req = pb.ImplicitGroupingKeyRequest(removeImplicitKey=pb.RemoveImplicitKey())
    assert req.SerializeToString() == b"\x12\x00"
    # auto-vivified ttl that was never written stays absent...
    cmd = pb.StateCallCommand(stateName="s")
    _ = cmd.ttl  # read access only
    assert b"\x22" not in cmd.SerializeToString()  # field 4 tag absent
    # ...but writing through it marks the parent field present
    cmd2 = pb.StateCallCommand(stateName="s")
    cmd2.ttl.durationMs = 1
    assert cmd2.SerializeToString().endswith(b"\x22\x02\x08\x01")


def test_nested_request_round_trip():
    inner = pb.ValueStateUpdate(value=b"\x01\x02")
    call = pb.ValueStateCall(stateName="spend", valueStateUpdate=inner)
    req = pb.StateRequest(
        stateVariableRequest=pb.StateVariableRequest(valueStateCall=call)
    )
    data = req.SerializeToString()
    back = pb.StateRequest()
    back.ParseFromString(data)
    assert back.stateVariableRequest.valueStateCall.stateName == "spend"
    assert back.stateVariableRequest.valueStateCall.valueStateUpdate.value == b"\x01\x02"


def test_negative_int32_round_trips_as_64bit_varint():
    r = pb.StateResponse(statusCode=-1, errorMessage="boom")
    back = pb.StateResponse()
    back.ParseFromString(r.SerializeToString())
    assert back.statusCode == -1 and back.errorMessage == "boom"
    assert back.value == b""  # absent scalar -> default


def test_repeated_bytes_and_repeated_message_parse():
    put = pb.ListStatePut(value=[b"a", b"bc"], fetchWithArrow=True)
    back = pb.ListStatePut()
    back.ParseFromString(put.SerializeToString())
    assert list(back.value) == [b"a", b"bc"] and back.fetchWithArrow is True

    it = pb.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            pb.KeyAndValuePair(key=b"k1", value=b"v1"),
            pb.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    back2 = pb.StateResponseWithMapIterator()
    back2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert back2.requireNextFetch is True


def test_unknown_fields_are_skipped():
    # field 15 varint + field 16 length-delimited, then statusCode=7
    data = b"\x78\x2a" + b"\x82\x01\x03abc" + b"\x08\x07"
    m = pb.StateResponse()
    m.ParseFromString(data)
    assert m.statusCode == 7


def test_hasfield_whichoneof_copyfrom():
    req = pb.StateVariableRequest(
        valueStateCall=pb.ValueStateCall(stateName="s", get=pb.Get())
    )
    assert req.HasField("valueStateCall") and not req.HasField("mapStateCall")
    assert req.WhichOneof("method") == "valueStateCall"
    assert pb.StateVariableRequest().WhichOneof("method") is None
    # auto-vivified-but-unwritten child is NOT present
    cmd = pb.StateCallCommand(stateName="x")
    _ = cmd.ttl
    assert not cmd.HasField("ttl")
    cmd.ttl.durationMs = 9
    assert cmd.HasField("ttl")

    dst = pb.StateResponse()
    dst.CopyFrom(pb.StateResponse(statusCode=3, value=b"z"))
    assert dst.statusCode == 3 and dst.value == b"z"


def test_append_mutated_repeated_field_serializes():
    # standard protobuf mutation idiom: auto-vivify the list via
    # __getattr__, then append — presence must follow the list's
    # contents, not only explicit assignment
    put = pb.ListStatePut()
    put.value.append(b"a")
    put.value.append(b"bc")
    wire = put.SerializeToString()
    assert wire == b"\x0a\x01a\x0a\x02bc"
    rt = pb.ListStatePut()
    rt.ParseFromString(wire)
    assert list(rt.value) == [b"a", b"bc"]
    # an auto-vivified-but-empty list is still absent
    empty = pb.ListStatePut()
    _ = empty.value
    assert empty.SerializeToString() == b""


def test_whichoneof_skips_non_oneof_message_fields():
    # StateCallCommand.ttl is a singular message field OUTSIDE the
    # oneof grouping; a populated ttl must not masquerade as an arm
    cmd = pb.StateCallCommand(stateName="s")
    cmd.ttl.durationMs = 7
    assert cmd.WhichOneof("method") is None


def test_install_registers_only_without_real_protobuf():
    target = "pyspark.sql.streaming.proto.StateMessage_pb2"
    saved = sys.modules.get(target)
    try:
        sys.modules.pop(target, None)
        installed = pb.install()
        try:
            from google.protobuf import descriptor  # noqa: F401

            have_protobuf = True
        except ImportError:
            have_protobuf = False
        if have_protobuf:
            assert not installed and target not in sys.modules
        else:
            assert installed and sys.modules[target] is pb
            import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

            assert sm.SetHandleState(state=sm.CREATED).SerializeToString() == b"\x08\x01"
    finally:
        if saved is not None:
            sys.modules[target] = saved
        else:
            sys.modules.pop(target, None)
