"""Pure-Python stand-in for ``pyspark.sql.streaming.proto.StateMessage_pb2``.

``transformWithStateInPandas`` talks to the JVM state server over a
protobuf wire protocol; pyspark only ships the *generated* message
module (``StateMessage_pb2.py``) and expects the ``protobuf`` runtime
to be installed.  This container has no ``google.protobuf`` and no
network, so instead of skipping the whole Spark-4 state API surface we
provide the ~40 messages ourselves:

- The **wire format** is the public proto3 encoding
  (https://protobuf.dev/programming-guides/encoding/): varint tags
  ``(field_number << 3) | wire_type``, wire type 0 for
  int32/int64/bool/enum, wire type 2 for strings/bytes/sub-messages.
- The **message shapes** (names, field numbers, types) are transcribed
  from Spark's own Apache-2.0 ``StateMessage.proto``
  (``org/apache/spark/sql/execution/streaming/StateMessage.proto``,
  embedded as the serialized descriptor in pyspark's
  ``StateMessage_pb2.py``) — the same public contract the JVM parses.
- Only the API surface pyspark's state clients actually use is
  implemented: keyword construction, attribute get/set (including
  auto-vivified sub-messages like ``cmd.ttl.durationMs = 5``),
  ``SerializeToString`` and ``ParseFromString``, repeated bytes /
  repeated message fields, and the ``HandleState`` enum constants.

``install()`` registers this module in ``sys.modules`` under the
generated module's name — **only when the real protobuf runtime is
absent** — so the lazy ``import pyspark.sql.streaming.proto.
StateMessage_pb2`` inside every state-client method resolves here.
``streaming/tws.py`` calls it at import time, which is exactly when a
Spark Python worker unpickles a ``StatefulProcessor`` defined there —
i.e. before the first state-server round trip in that worker.

proto3 presence rules implemented: scalar fields serialize only when
explicitly set (so defaults stay off the wire, as the JVM expects);
message fields serialize when explicitly set *or* when an
auto-vivified child has set fields (that is what makes an empty oneof
arm like ``RemoveImplicitKey()`` round-trip while an untouched ``ttl``
stays absent).
"""

from __future__ import annotations

import os
import sys

_DEBUG = os.environ.get("SPARK_SHIM_DEBUG", "") == "1"

# ---------------------------------------------------------------------------
# wire-format primitives (public proto3 encoding)
# ---------------------------------------------------------------------------


def _enc_varint(value: int) -> bytes:
    # negative int32/int64 encode as 64-bit two's complement varints
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


def _dec_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _signed64(value: int) -> int:
    """Map the unsigned varint payload back to a signed int64."""
    return value - (1 << 64) if value >= (1 << 63) else value


def _enc_tag(number: int, wire_type: int) -> bytes:
    return _enc_varint((number << 3) | wire_type)


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = _dec_varint(buf, pos)
    elif wire_type == 1:
        pos += 8
    elif wire_type == 2:
        n, pos = _dec_varint(buf, pos)
        pos += n
    elif wire_type == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire_type}")
    return pos


# ---------------------------------------------------------------------------
# tiny message framework
# ---------------------------------------------------------------------------

_SCALAR_DEFAULTS = {
    "int32": 0,
    "int64": 0,
    "bool": False,
    "enum": 0,
    "string": "",
    "bytes": b"",
}


class _Field:
    __slots__ = ("number", "kind", "repeated", "message_type")

    def __init__(self, number, kind, repeated=False, message_type=None):
        self.number = number
        self.kind = kind  # one of _SCALAR_DEFAULTS keys or "message"
        self.repeated = repeated
        self.message_type = message_type  # class name string, resolved lazily


class _Message:
    """Base for all shim messages; subclasses define ``_FIELDS``."""

    _FIELDS: dict[str, _Field] = {}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_set", set())
        for name, value in kwargs.items():
            setattr(self, name, value)

    # -- attribute protocol --------------------------------------------------

    def __getattr__(self, name):
        fields = type(self)._FIELDS
        if name not in fields:
            raise AttributeError(name)
        f = fields[name]
        values = object.__getattribute__(self, "_values")
        if name in values:
            return values[name]
        if f.repeated:
            values[name] = []
            return values[name]
        if f.kind == "message":
            # auto-vivify: real protobuf returns a child whose mutation
            # marks the parent field present (cmd.ttl.durationMs = 5)
            child = _MESSAGE_TYPES[f.message_type]()
            values[name] = child
            return child
        return _SCALAR_DEFAULTS[f.kind]

    def __setattr__(self, name, value):
        fields = type(self)._FIELDS
        if name not in fields:
            raise AttributeError(f"{type(self).__name__} has no field {name}")
        f = fields[name]
        if f.repeated:
            value = list(value)
        elif f.kind == "message" and value is not None and not isinstance(value, _Message):
            raise TypeError(f"{name} expects a message, got {type(value)}")
        self._values[name] = value
        self._set.add(name)

    # -- presence ------------------------------------------------------------

    def _present(self, name: str, f: _Field) -> bool:
        if name in self._set:
            return True
        if f.repeated:
            # append-mutation (msg.field.append(x)) auto-vivifies the
            # list without touching _set — a non-empty list IS presence
            return bool(self._values.get(name))
        if f.kind == "message" and name in self._values:
            child = self._values[name]
            return bool(child._set) or any(
                child._present(n, cf) for n, cf in type(child)._FIELDS.items()
            )
        return False

    # -- serialize -----------------------------------------------------------

    def SerializeToString(self) -> bytes:  # noqa: N802 (protobuf API)
        if _DEBUG:
            print(f"SHIM>> {self!r}", file=sys.stderr, flush=True)
        out = bytearray()
        for name, f in sorted(
            type(self)._FIELDS.items(), key=lambda kv: kv[1].number
        ):
            if not self._present(name, f):
                continue
            value = self._values.get(name)
            if f.repeated:
                for item in value or []:
                    out += self._encode_one(f, item)
            else:
                out += self._encode_one(f, value)
        return bytes(out)

    @staticmethod
    def _encode_one(f: _Field, value) -> bytes:
        if f.kind in ("int32", "int64", "enum"):
            return _enc_tag(f.number, 0) + _enc_varint(int(value))
        if f.kind == "bool":
            return _enc_tag(f.number, 0) + _enc_varint(1 if value else 0)
        if f.kind == "string":
            payload = value.encode("utf-8")
            return _enc_tag(f.number, 2) + _enc_varint(len(payload)) + payload
        if f.kind == "bytes":
            payload = bytes(value)
            return _enc_tag(f.number, 2) + _enc_varint(len(payload)) + payload
        if f.kind == "message":
            payload = value.SerializeToString() if value is not None else b""
            return _enc_tag(f.number, 2) + _enc_varint(len(payload)) + payload
        raise ValueError(f"unsupported kind {f.kind}")

    # -- parse ---------------------------------------------------------------

    def ParseFromString(self, data: bytes) -> int:  # noqa: N802
        self._values.clear()
        self._set.clear()
        by_number = {
            f.number: (name, f) for name, f in type(self)._FIELDS.items()
        }
        pos, end = 0, len(data)
        while pos < end:
            key, pos = _dec_varint(data, pos)
            number, wire_type = key >> 3, key & 7
            if number not in by_number:
                pos = _skip_field(data, pos, wire_type)
                continue
            name, f = by_number[number]
            if wire_type == 0:
                raw, pos = _dec_varint(data, pos)
                if f.kind == "bool":
                    value = bool(raw)
                elif f.kind in ("int32", "int64"):
                    value = _signed64(raw)
                else:  # enum
                    value = raw
            elif wire_type == 2:
                n, pos = _dec_varint(data, pos)
                chunk = data[pos : pos + n]
                pos += n
                if f.kind == "string":
                    value = chunk.decode("utf-8")
                elif f.kind == "bytes":
                    value = bytes(chunk)
                elif f.kind == "message":
                    value = _MESSAGE_TYPES[f.message_type]()
                    value.ParseFromString(chunk)
                else:
                    raise ValueError(f"wire type 2 for {f.kind}")
            else:
                pos = _skip_field(data, pos, wire_type)
                continue
            if f.repeated:
                self._values.setdefault(name, []).append(value)
            else:
                self._values[name] = value
            self._set.add(name)
        if _DEBUG:
            print(f"SHIM<< {self!r}", file=sys.stderr, flush=True)
        return len(data)

    # -- auxiliary protobuf APIs (defensive: pyspark's state clients
    # don't call these today, but they are the next obvious surface a
    # pyspark patch release could reach for) ---------------------------------

    def HasField(self, name: str) -> bool:  # noqa: N802
        f = type(self)._FIELDS.get(name)
        if f is None or f.repeated:
            raise ValueError(f"{type(self).__name__} has no singular field {name}")
        return self._present(name, f)

    def WhichOneof(self, _oneof_name: str) -> str | None:  # noqa: N802
        # every oneof in StateMessage.proto is a set of message-typed
        # arms within one message, so "the set message field" resolves
        # it without tracking oneof grouping explicitly — EXCEPT the
        # singular message fields that sit outside any oneof
        # (_NON_ONEOF_MESSAGE_FIELDS), which must never be reported as
        # a oneof arm
        skip = _NON_ONEOF_MESSAGE_FIELDS.get(type(self).__name__, ())
        for name, f in type(self)._FIELDS.items():
            if name in skip:
                continue
            if f.kind == "message" and not f.repeated and self._present(name, f):
                return name
        return None

    def CopyFrom(self, other: "_Message") -> None:  # noqa: N802
        if type(other) is not type(self):
            raise TypeError(f"CopyFrom expects {type(self).__name__}")
        self.ParseFromString(other.SerializeToString())

    def __repr__(self):
        parts = ", ".join(
            f"{n}={self._values[n]!r}" for n in sorted(self._set)
        )
        return f"{type(self).__name__}({parts})"


# ---------------------------------------------------------------------------
# message definitions — field numbers transcribed from Spark's
# StateMessage.proto (see module docstring)
# ---------------------------------------------------------------------------

# singular message-typed fields that are NOT oneof arms in
# StateMessage.proto (everything else message-typed lives inside a
# "method"-style oneof); WhichOneof must skip these
_NON_ONEOF_MESSAGE_FIELDS: dict[str, frozenset[str]] = {
    "StateCallCommand": frozenset({"ttl"}),
}

_SPECS: dict[str, dict[str, tuple]] = {
    # requests
    "StateRequest": {
        "version": (1, "int32"),
        "statefulProcessorCall": (2, "message", "StatefulProcessorCall"),
        "stateVariableRequest": (3, "message", "StateVariableRequest"),
        "implicitGroupingKeyRequest": (4, "message", "ImplicitGroupingKeyRequest"),
        "timerRequest": (5, "message", "TimerRequest"),
        "utilsRequest": (6, "message", "UtilsRequest"),
    },
    "StatefulProcessorCall": {
        "setHandleState": (1, "message", "SetHandleState"),
        "getValueState": (2, "message", "StateCallCommand"),
        "getListState": (3, "message", "StateCallCommand"),
        "getMapState": (4, "message", "StateCallCommand"),
        "timerStateCall": (5, "message", "TimerStateCallCommand"),
        "deleteIfExists": (6, "message", "StateCallCommand"),
    },
    "StateVariableRequest": {
        "valueStateCall": (1, "message", "ValueStateCall"),
        "listStateCall": (2, "message", "ListStateCall"),
        "mapStateCall": (3, "message", "MapStateCall"),
    },
    "ImplicitGroupingKeyRequest": {
        "setImplicitKey": (1, "message", "SetImplicitKey"),
        "removeImplicitKey": (2, "message", "RemoveImplicitKey"),
    },
    "TimerRequest": {
        "timerValueRequest": (1, "message", "TimerValueRequest"),
        "expiryTimerRequest": (2, "message", "ExpiryTimerRequest"),
    },
    "TimerValueRequest": {
        "getProcessingTimer": (1, "message", "GetProcessingTime"),
        "getWatermark": (2, "message", "GetWatermark"),
    },
    "ExpiryTimerRequest": {
        "iteratorId": (1, "string"),
        "expiryTimestampMs": (2, "int64"),
    },
    "GetProcessingTime": {},
    "GetWatermark": {},
    "UtilsRequest": {
        "parseStringSchema": (1, "message", "ParseStringSchema"),
    },
    "ParseStringSchema": {"schema": (1, "string")},
    "StateCallCommand": {
        "stateName": (1, "string"),
        "schema": (2, "string"),
        "mapStateValueSchema": (3, "string"),
        "ttl": (4, "message", "TTLConfig"),
    },
    "TimerStateCallCommand": {
        "register": (1, "message", "RegisterTimer"),
        "delete": (2, "message", "DeleteTimer"),
        "list": (3, "message", "ListTimers"),
    },
    "ValueStateCall": {
        "stateName": (1, "string"),
        "exists": (2, "message", "Exists"),
        "get": (3, "message", "Get"),
        "valueStateUpdate": (4, "message", "ValueStateUpdate"),
        "clear": (5, "message", "Clear"),
    },
    "ListStateCall": {
        "stateName": (1, "string"),
        "exists": (2, "message", "Exists"),
        "listStateGet": (3, "message", "ListStateGet"),
        "listStatePut": (4, "message", "ListStatePut"),
        "appendValue": (5, "message", "AppendValue"),
        "appendList": (6, "message", "AppendList"),
        "clear": (7, "message", "Clear"),
    },
    "MapStateCall": {
        "stateName": (1, "string"),
        "exists": (2, "message", "Exists"),
        "getValue": (3, "message", "GetValue"),
        "containsKey": (4, "message", "ContainsKey"),
        "updateValue": (5, "message", "UpdateValue"),
        "iterator": (6, "message", "Iterator"),
        "keys": (7, "message", "Keys"),
        "values": (8, "message", "Values"),
        "removeKey": (9, "message", "RemoveKey"),
        "clear": (10, "message", "Clear"),
    },
    "SetImplicitKey": {"key": (1, "bytes")},
    "RemoveImplicitKey": {},
    "Exists": {},
    "Get": {},
    "RegisterTimer": {"expiryTimestampMs": (1, "int64")},
    "DeleteTimer": {"expiryTimestampMs": (1, "int64")},
    "ListTimers": {"iteratorId": (1, "string")},
    "ValueStateUpdate": {"value": (1, "bytes")},
    "Clear": {},
    "ListStateGet": {"iteratorId": (1, "string")},
    "ListStatePut": {
        "value": (1, "bytes", "repeated"),
        "fetchWithArrow": (2, "bool"),
    },
    "AppendValue": {"value": (1, "bytes")},
    "AppendList": {
        "value": (1, "bytes", "repeated"),
        "fetchWithArrow": (2, "bool"),
    },
    "GetValue": {"userKey": (1, "bytes")},
    "ContainsKey": {"userKey": (1, "bytes")},
    "UpdateValue": {"userKey": (1, "bytes"), "value": (2, "bytes")},
    "Iterator": {"iteratorId": (1, "string")},
    "Keys": {"iteratorId": (1, "string")},
    "Values": {"iteratorId": (1, "string")},
    "RemoveKey": {"userKey": (1, "bytes")},
    "SetHandleState": {"state": (1, "enum")},
    "TTLConfig": {"durationMs": (1, "int64")},
    # responses
    "StateResponse": {
        "statusCode": (1, "int32"),
        "errorMessage": (2, "string"),
        "value": (3, "bytes"),
    },
    "StateResponseWithLongTypeVal": {
        "statusCode": (1, "int32"),
        "errorMessage": (2, "string"),
        "value": (3, "int64"),
    },
    "StateResponseWithStringTypeVal": {
        "statusCode": (1, "int32"),
        "errorMessage": (2, "string"),
        "value": (3, "string"),
    },
    "StateResponseWithListGet": {
        "statusCode": (1, "int32"),
        "errorMessage": (2, "string"),
        "value": (3, "bytes", "repeated"),
        "requireNextFetch": (4, "bool"),
    },
    "StateResponseWithMapKeysOrValues": {
        "statusCode": (1, "int32"),
        "errorMessage": (2, "string"),
        "value": (3, "bytes", "repeated"),
        "requireNextFetch": (4, "bool"),
    },
    "KeyAndValuePair": {"key": (1, "bytes"), "value": (2, "bytes")},
    "StateResponseWithMapIterator": {
        "statusCode": (1, "int32"),
        "errorMessage": (2, "string"),
        "kvPair": (3, "message", "KeyAndValuePair", "repeated"),
        "requireNextFetch": (4, "bool"),
    },
    "TimerInfo": {"key": (1, "bytes"), "timestampMs": (2, "int64")},
    "StateResponseWithTimer": {
        "statusCode": (1, "int32"),
        "errorMessage": (2, "string"),
        "timer": (3, "message", "TimerInfo", "repeated"),
        "requireNextFetch": (4, "bool"),
    },
}

_MESSAGE_TYPES: dict[str, type] = {}

for _name, _spec in _SPECS.items():
    _fields = {}
    for _fname, _def in _spec.items():
        _number, _kind = _def[0], _def[1]
        _repeated = "repeated" in _def[2:]
        _mtype = None
        if _kind == "message":
            _mtype = _def[2]
        _fields[_fname] = _Field(_number, _kind, _repeated, _mtype)
    _MESSAGE_TYPES[_name] = type(_name, (_Message,), {"_FIELDS": _fields})
    globals()[_name] = _MESSAGE_TYPES[_name]

# HandleState enum constants (module level, as generated code exposes them)
PRE_INIT = 0
CREATED = 1
INITIALIZED = 2
DATA_PROCESSED = 3
TIMER_PROCESSED = 4
CLOSED = 5


# ---------------------------------------------------------------------------
# installation
# ---------------------------------------------------------------------------

_TARGET = "pyspark.sql.streaming.proto.StateMessage_pb2"


def install() -> bool:
    """Register this module as ``StateMessage_pb2`` iff the real
    protobuf runtime is unavailable.  Returns True when the shim is
    (or already was) installed.  Idempotent; never shadows a working
    generated module."""
    try:
        # probe the concrete module the generated code needs — a bare
        # `import google.protobuf` can succeed as an EMPTY namespace
        # package (observed in this container) while the runtime is
        # absent
        from google.protobuf import descriptor  # noqa: F401

        return False  # real runtime present — generated module works
    except ImportError:
        pass
    this = sys.modules[__name__]
    existing = sys.modules.get(_TARGET)
    if existing is not None and existing is not this:
        return existing is this
    sys.modules[_TARGET] = this
    # `import a.b.c` also resolves via the parent package attribute
    try:
        import pyspark.sql.streaming.proto as proto_pkg

        setattr(proto_pkg, "StateMessage_pb2", this)
    except ImportError:
        pass
    return True
