"""Wire-format tests for the pure-Python StateMessage_pb2 twin.

Golden byte strings are hand-assembled from the proto3 spec (tag =
(field_number << 3) | wire_type; varint little-endian 7-bit groups;
length-delimited submessages), so the shim is checked against the FORMAT,
not against itself. The integration seal is
tests/test_streaming.py::test_transform_with_state_twin_matches_batch_and_oracle,
which runs a real transformWithStateInPandas query through the shim against
the JVM state server.
"""

from __future__ import annotations

from pagopa_ecommerce_cdc_service_spark.streaming import state_message_shim as pb


def test_set_handle_state_golden_bytes():
    msg = pb.StateRequest(
        statefulProcessorCall=pb.StatefulProcessorCall(
            setHandleState=pb.SetHandleState(state=pb.INITIALIZED)
        )
    )
    # SetHandleState: field1 varint 2      -> 08 02
    # StatefulProcessorCall: field1 msg    -> 0a 02 08 02
    # StateRequest: field2 msg             -> 12 04 0a 02 08 02
    assert msg.SerializeToString() == b"\x12\x04\x0a\x02\x08\x02"


def test_empty_oneof_member_still_hits_the_wire():
    # RemoveImplicitKey is an EMPTY message: the JVM distinguishes the oneof
    # case purely by the presence of tag 2 with length 0
    msg = pb.StateRequest(
        implicitGroupingKeyRequest=pb.ImplicitGroupingKeyRequest(
            removeImplicitKey=pb.RemoveImplicitKey()
        )
    )
    # StateRequest field4 (tag 0x22) wrapping ImplicitGroupingKeyRequest
    # field2 (tag 0x12) with empty body
    assert msg.SerializeToString() == b"\x22\x02\x12\x00"


def test_bytes_string_and_attribute_assignment():
    cmd = pb.StateCallCommand()
    cmd.stateName = "packed"
    cmd.schema = "s"
    # stateName: tag 0a len 6 'packed'; schema: tag 12 len 1 's'
    assert cmd.SerializeToString() == b"\x0a\x06packed\x12\x01s"
    key = pb.SetImplicitKey(key=b"ab")
    assert key.SerializeToString() == b"\x0a\x02ab"


def test_submessage_autovivify_marks_presence():
    cmd = pb.StateCallCommand()
    cmd.stateName = "v"
    cmd.ttl.durationMs = 5
    # ttl is field 4: tag 0x22, body = field1 varint 5 -> 08 05
    assert cmd.SerializeToString() == b"\x0a\x01v\x22\x02\x08\x05"
    # and an untouched submessage field stays absent
    cmd2 = pb.StateCallCommand(stateName="v")
    assert cmd2.SerializeToString() == b"\x0a\x01v"
    assert not cmd2.HasField("ttl")


def test_parse_response_with_defaults_omitted():
    # a real proto3 serializer omits statusCode=0; value carries the payload
    resp = pb.StateResponse()
    resp.ParseFromString(b"\x1a\x03xyz")
    assert resp.statusCode == 0
    assert resp.errorMessage == ""
    assert resp.value == b"xyz"


def test_negative_int64_ten_byte_varint_round_trip():
    resp = pb.StateResponseWithLongTypeVal()
    wire = b"\x18" + b"\xff" * 9 + b"\x01"  # field3 varint -1
    resp.ParseFromString(wire)
    assert resp.value == -1
    # and our encoder produces the same two's-complement form
    out = pb.RegisterTimer(expiryTimestampMs=-1).SerializeToString()
    assert out == b"\x08" + b"\xff" * 9 + b"\x01"


def test_repeated_fields_parse_and_serialize():
    resp = pb.StateResponseWithListGet()
    resp.ParseFromString(b"\x1a\x01a\x1a\x01b\x20\x01")
    assert resp.value == [b"a", b"b"]
    assert resp.requireNextFetch is True
    put = pb.ListStatePut(value=[b"x", b"yz"])
    assert put.SerializeToString() == b"\x0a\x01x\x0a\x02yz"
    # repeated message
    it = pb.StateResponseWithMapIterator()
    it.ParseFromString(b"\x1a\x06\x0a\x01k\x12\x01v")
    assert len(it.kvPair) == 1
    assert (it.kvPair[0].key, it.kvPair[0].value) == (b"k", b"v")


def test_unknown_fields_are_skipped():
    resp = pb.StateResponse()
    # field 15 varint (skipped), field 14 len-delimited (skipped), then real
    resp.ParseFromString(b"\x78\x2a\x72\x02zz\x08\x01")
    assert resp.statusCode == 1


def test_round_trip_every_request_shape():
    shapes = [
        pb.StateRequest(version=3),
        pb.StateRequest(
            stateVariableRequest=pb.StateVariableRequest(
                valueStateCall=pb.ValueStateCall(
                    stateName="packed", valueStateUpdate=pb.ValueStateUpdate(value=b"p")
                )
            )
        ),
        pb.StateRequest(
            utilsRequest=pb.UtilsRequest(
                parseStringSchema=pb.ParseStringSchema(schema="a INT")
            )
        ),
        pb.StateRequest(
            timerRequest=pb.TimerRequest(
                timerValueRequest=pb.TimerValueRequest(
                    getWatermark=pb.GetWatermark()
                )
            )
        ),
    ]
    for msg in shapes:
        twin = pb.StateRequest()
        twin.ParseFromString(msg.SerializeToString())
        assert twin.SerializeToString() == msg.SerializeToString()


def test_install_is_a_noop_when_real_runtime_present():
    import sys

    if pb.protobuf_runtime_available():
        assert pb.install() is False
    else:
        assert pb.install() is True
        assert sys.modules["pyspark.sql.streaming.proto.StateMessage_pb2"] is pb
