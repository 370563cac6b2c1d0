"""Minimal pure-Python protobuf wire-format twin of pyspark's
``StateMessage_pb2`` — lets ``transformWithStateInPandas`` run in
environments that ship pyspark without the ``google.protobuf`` runtime.

The transformWithState Python worker talks to the JVM state server over a
socket using length-prefixed protobuf messages
(``pyspark/sql/streaming/stateful_processor_api_client.py``; message set
defined in Spark's ``StateMessage.proto``). pyspark's generated module
needs the full protobuf runtime only to BUILD the message classes — the
wire format itself (proto3: varint tags, length-delimited submessages) is
small and stable. This module hand-implements exactly the message set of
``StateMessage.proto`` (field numbers transcribed from the embedded
descriptor of the generated module) on a ~150-line encoder/decoder, and
:func:`install` drops it into ``sys.modules`` under the generated module's
name when the real runtime is unavailable.

Semantics notes (all verified against the proto3 spec and the JVM parser's
behavior):

- presence: a field serializes iff it was explicitly set (constructor
  kwarg or attribute write). Oneof members that are EMPTY messages (e.g.
  ``RemoveImplicitKey``) must still hit the wire as ``tag + len(0)`` —
  presence tracking, not value tracking, makes that work.
- submessage auto-vivification: ``cmd.ttl.durationMs = 5`` creates and
  marks ``ttl`` present on first access, matching how the pyspark client
  writes nested fields.
- negative int32/int64 serialize as 10-byte two's-complement varints;
  decode masks back to signed.
- unknown fields are skipped by wire type on parse (forward compat).
"""

from __future__ import annotations

import sys

_WIRE_VARINT = 0
_WIRE_64 = 1
_WIRE_LEN = 2
_WIRE_32 = 5


def _enc_varint(value: int) -> bytes:
    if value < 0:
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _signed(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


class _Field:
    __slots__ = ("num", "name", "kind", "repeated", "msg")

    def __init__(self, num, name, kind, msg=None, repeated=False):
        self.num, self.name, self.kind = num, name, kind
        self.msg, self.repeated = msg, repeated


class Message:
    """Tiny proto3 message base: presence-tracked fields, wire ser/de."""

    FIELDS: tuple = ()
    _BY_NAME: dict = {}
    _BY_NUM: dict = {}

    def __init_subclass__(cls):
        cls._BY_NAME = {f.name: f for f in cls.FIELDS}
        cls._BY_NUM = {f.num: f for f in cls.FIELDS}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        for name, value in kwargs.items():
            if name not in self._BY_NAME:
                raise TypeError(f"{type(self).__name__} has no field {name!r}")
            setattr(self, name, value)

    def __setattr__(self, name, value):
        field = self._BY_NAME.get(name)
        if field is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        if field.repeated:
            value = list(value)
        self._values[name] = value

    def __getattr__(self, name):
        # only called when not found normally; _values lives on the instance
        field = type(self)._BY_NAME.get(name)
        if field is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        values = self.__dict__["_values"]
        if name in values:
            return values[name]
        if field.repeated:
            return values.setdefault(name, [])
        if field.kind == "message":
            # auto-vivify + mark present (the client writes through this)
            return values.setdefault(name, field.msg())
        return {"string": "", "bytes": b"", "bool": False}.get(field.kind, 0)

    def HasField(self, name: str) -> bool:
        return name in self._values

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for field in self.FIELDS:
            if field.name not in self._values:
                continue
            items = (
                self._values[field.name]
                if field.repeated
                else [self._values[field.name]]
            )
            for item in items:
                out += _enc_varint(
                    (field.num << 3)
                    | (_WIRE_LEN if field.kind in ("message", "string", "bytes") else _WIRE_VARINT)
                )
                if field.kind == "message":
                    body = item.SerializeToString()
                    out += _enc_varint(len(body)) + body
                elif field.kind == "string":
                    body = item.encode("utf-8")
                    out += _enc_varint(len(body)) + body
                elif field.kind == "bytes":
                    out += _enc_varint(len(item)) + bytes(item)
                elif field.kind == "bool":
                    out += _enc_varint(1 if item else 0)
                else:  # int32 / int64 / enum
                    out += _enc_varint(int(item))
        return bytes(out)

    def ParseFromString(self, data) -> int:
        self._values.clear()
        buf = memoryview(bytes(data))
        pos, end = 0, len(buf)
        while pos < end:
            tag, pos = _dec_varint(buf, pos)
            num, wire = tag >> 3, tag & 0x7
            field = self._BY_NUM.get(num)
            if field is None:  # skip unknown
                if wire == _WIRE_VARINT:
                    _, pos = _dec_varint(buf, pos)
                elif wire == _WIRE_LEN:
                    n, pos = _dec_varint(buf, pos)
                    pos += n
                elif wire == _WIRE_32:
                    pos += 4
                elif wire == _WIRE_64:
                    pos += 8
                else:
                    raise ValueError(f"unsupported wire type {wire}")
                continue
            if field.kind in ("message", "string", "bytes"):
                n, pos = _dec_varint(buf, pos)
                chunk = bytes(buf[pos : pos + n])
                pos += n
                if field.kind == "message":
                    sub = field.msg()
                    sub.ParseFromString(chunk)
                    value = sub
                elif field.kind == "string":
                    value = chunk.decode("utf-8")
                else:
                    value = chunk
            else:
                raw, pos = _dec_varint(buf, pos)
                if field.kind == "bool":
                    value = bool(raw)
                else:
                    value = _signed(raw)
            if field.repeated:
                self._values.setdefault(field.name, []).append(value)
            else:
                self._values[field.name] = value
        return end

    def __repr__(self):
        inner = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{type(self).__name__}({inner})"


def _msg(name, *specs):
    """Build a Message subclass from (num, name, kind[, msg_class]) specs."""
    fields = []
    for spec in specs:
        num, fname, kind = spec[0], spec[1], spec[2]
        msg_cls = spec[3] if len(spec) > 3 and not isinstance(spec[3], bool) else None
        repeated = bool(spec[-1]) if isinstance(spec[-1], bool) else False
        fields.append(_Field(num, fname, kind, msg_cls, repeated))
    cls = type(name, (Message,), {"FIELDS": tuple(fields)})
    globals()[name] = cls
    return cls


# --- message set of StateMessage.proto, leaves first ------------------------
# field numbers/kinds transcribed from the serialized descriptor embedded in
# pyspark/sql/streaming/proto/StateMessage_pb2.py
_msg("SetImplicitKey", (1, "key", "bytes"))
_msg("RemoveImplicitKey")
_msg("Exists")
_msg("Get")
_msg("RegisterTimer", (1, "expiryTimestampMs", "int64"))
_msg("DeleteTimer", (1, "expiryTimestampMs", "int64"))
_msg("ListTimers", (1, "iteratorId", "string"))
_msg("ValueStateUpdate", (1, "value", "bytes"))
_msg("Clear")
_msg("ListStateGet", (1, "iteratorId", "string"))
_msg("ListStatePut", (1, "value", "bytes", True), (2, "fetchWithArrow", "bool"))
_msg("AppendValue", (1, "value", "bytes"))
_msg("AppendList", (1, "value", "bytes", True), (2, "fetchWithArrow", "bool"))
_msg("GetValue", (1, "userKey", "bytes"))
_msg("ContainsKey", (1, "userKey", "bytes"))
_msg("UpdateValue", (1, "userKey", "bytes"), (2, "value", "bytes"))
_msg("Iterator", (1, "iteratorId", "string"))
_msg("Keys", (1, "iteratorId", "string"))
_msg("Values", (1, "iteratorId", "string"))
_msg("RemoveKey", (1, "userKey", "bytes"))
_msg("SetHandleState", (1, "state", "enum"))
_msg("TTLConfig", (1, "durationMs", "int64"))
_msg("GetProcessingTime")
_msg("GetWatermark")
_msg("ParseStringSchema", (1, "schema", "string"))
_msg("KeyAndValuePair", (1, "key", "bytes"), (2, "value", "bytes"))
_msg("TimerInfo", (1, "key", "bytes"), (2, "timestampMs", "int64"))

_msg(
    "StateCallCommand",
    (1, "stateName", "string"),
    (2, "schema", "string"),
    (3, "mapStateValueSchema", "string"),
    (4, "ttl", "message", TTLConfig),  # noqa: F821
)
_msg(
    "TimerStateCallCommand",
    (1, "register", "message", RegisterTimer),  # noqa: F821
    (2, "delete", "message", DeleteTimer),  # noqa: F821
    (3, "list", "message", ListTimers),  # noqa: F821
)
_msg(
    "ValueStateCall",
    (1, "stateName", "string"),
    (2, "exists", "message", Exists),  # noqa: F821
    (3, "get", "message", Get),  # noqa: F821
    (4, "valueStateUpdate", "message", ValueStateUpdate),  # noqa: F821
    (5, "clear", "message", Clear),  # noqa: F821
)
_msg(
    "ListStateCall",
    (1, "stateName", "string"),
    (2, "exists", "message", Exists),  # noqa: F821
    (3, "listStateGet", "message", ListStateGet),  # noqa: F821
    (4, "listStatePut", "message", ListStatePut),  # noqa: F821
    (5, "appendValue", "message", AppendValue),  # noqa: F821
    (6, "appendList", "message", AppendList),  # noqa: F821
    (7, "clear", "message", Clear),  # noqa: F821
)
_msg(
    "MapStateCall",
    (1, "stateName", "string"),
    (2, "exists", "message", Exists),  # noqa: F821
    (3, "getValue", "message", GetValue),  # noqa: F821
    (4, "containsKey", "message", ContainsKey),  # noqa: F821
    (5, "updateValue", "message", UpdateValue),  # noqa: F821
    (6, "iterator", "message", Iterator),  # noqa: F821
    (7, "keys", "message", Keys),  # noqa: F821
    (8, "values", "message", Values),  # noqa: F821
    (9, "removeKey", "message", RemoveKey),  # noqa: F821
    (10, "clear", "message", Clear),  # noqa: F821
)
_msg(
    "StatefulProcessorCall",
    (1, "setHandleState", "message", SetHandleState),  # noqa: F821
    (2, "getValueState", "message", StateCallCommand),  # noqa: F821
    (3, "getListState", "message", StateCallCommand),  # noqa: F821
    (4, "getMapState", "message", StateCallCommand),  # noqa: F821
    (5, "timerStateCall", "message", TimerStateCallCommand),  # noqa: F821
    (6, "deleteIfExists", "message", StateCallCommand),  # noqa: F821
)
_msg(
    "StateVariableRequest",
    (1, "valueStateCall", "message", ValueStateCall),  # noqa: F821
    (2, "listStateCall", "message", ListStateCall),  # noqa: F821
    (3, "mapStateCall", "message", MapStateCall),  # noqa: F821
)
_msg(
    "ImplicitGroupingKeyRequest",
    (1, "setImplicitKey", "message", SetImplicitKey),  # noqa: F821
    (2, "removeImplicitKey", "message", RemoveImplicitKey),  # noqa: F821
)
_msg(
    "TimerValueRequest",
    (1, "getProcessingTimer", "message", GetProcessingTime),  # noqa: F821
    (2, "getWatermark", "message", GetWatermark),  # noqa: F821
)
_msg(
    "ExpiryTimerRequest",
    (1, "iteratorId", "string"),
    (2, "expiryTimestampMs", "int64"),
)
_msg(
    "TimerRequest",
    (1, "timerValueRequest", "message", TimerValueRequest),  # noqa: F821
    (2, "expiryTimerRequest", "message", ExpiryTimerRequest),  # noqa: F821
)
_msg("UtilsRequest", (1, "parseStringSchema", "message", ParseStringSchema))  # noqa: F821
_msg(
    "StateRequest",
    (1, "version", "int32"),
    (2, "statefulProcessorCall", "message", StatefulProcessorCall),  # noqa: F821
    (3, "stateVariableRequest", "message", StateVariableRequest),  # noqa: F821
    (4, "implicitGroupingKeyRequest", "message", ImplicitGroupingKeyRequest),  # noqa: F821
    (5, "timerRequest", "message", TimerRequest),  # noqa: F821
    (6, "utilsRequest", "message", UtilsRequest),  # noqa: F821
)
_msg(
    "StateResponse",
    (1, "statusCode", "int32"),
    (2, "errorMessage", "string"),
    (3, "value", "bytes"),
)
_msg(
    "StateResponseWithLongTypeVal",
    (1, "statusCode", "int32"),
    (2, "errorMessage", "string"),
    (3, "value", "int64"),
)
_msg(
    "StateResponseWithStringTypeVal",
    (1, "statusCode", "int32"),
    (2, "errorMessage", "string"),
    (3, "value", "string"),
)
_msg(
    "StateResponseWithListGet",
    (1, "statusCode", "int32"),
    (2, "errorMessage", "string"),
    (3, "value", "bytes", True),
    (4, "requireNextFetch", "bool"),
)
_msg(
    "StateResponseWithMapKeysOrValues",
    (1, "statusCode", "int32"),
    (2, "errorMessage", "string"),
    (3, "value", "bytes", True),
    (4, "requireNextFetch", "bool"),
)
_msg(
    "StateResponseWithMapIterator",
    (1, "statusCode", "int32"),
    (2, "errorMessage", "string"),
    (3, "kvPair", "message", KeyAndValuePair, True),  # noqa: F821
    (4, "requireNextFetch", "bool"),
)
_msg(
    "StateResponseWithTimer",
    (1, "statusCode", "int32"),
    (2, "errorMessage", "string"),
    (3, "timer", "message", TimerInfo, True),  # noqa: F821
    (4, "requireNextFetch", "bool"),
)


class HandleState:
    PRE_INIT = 0
    CREATED = 1
    INITIALIZED = 2
    DATA_PROCESSED = 3
    TIMER_PROCESSED = 4
    CLOSED = 5


# the generated module exposes enum values at module level too
PRE_INIT = HandleState.PRE_INIT
CREATED = HandleState.CREATED
INITIALIZED = HandleState.INITIALIZED
DATA_PROCESSED = HandleState.DATA_PROCESSED
TIMER_PROCESSED = HandleState.TIMER_PROCESSED
CLOSED = HandleState.CLOSED

_PB2_NAME = "pyspark.sql.streaming.proto.StateMessage_pb2"


def protobuf_runtime_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def install() -> bool:
    """Register this module as ``StateMessage_pb2`` when the real protobuf
    runtime is missing. Returns True if the shim is (now) active. Must run
    before the first state-server call — both driver and worker side import
    it lazily inside methods, so installing at our package-import time (the
    unpickle of the stateful processor triggers it in workers) is early
    enough."""
    if protobuf_runtime_available():
        return False
    this = sys.modules[__name__]
    existing = sys.modules.get(_PB2_NAME)
    if existing is not None and existing is not this:
        return existing is this
    sys.modules[_PB2_NAME] = this
    try:  # `import a.b.c as x` may bind via parent-package attribute
        import pyspark.sql.streaming.proto as proto_pkg

        setattr(proto_pkg, "StateMessage_pb2", this)
    except ImportError:
        pass
    return True
