"""Minimal protobuf runtime ("protolite") — enough of the public
Protocol Buffers wire format and descriptor model to stand in for the
absent ``google.protobuf`` package behind ONE specific generated
module: pyspark's ``StateMessage_pb2`` (the state-server protocol of
``transformWithStateInPandas``).

Why: Spark 4's stateful-processing Python client frames protobuf
messages over a socket (`stateful_processor_api_client.py`), importing
its generated ``_pb2`` module lazily. The generated file ships with
pyspark — including the embedded serialized ``FileDescriptorProto`` —
but needs the protobuf RUNTIME, which this container does not have.
Same playbook as ``sinks/pgwire.py``: the wire format is public and
small (varint / 64-bit / length-delimited / 32-bit fields,
developers.google.com/protocol-buffers/docs/encoding), so a bounded
reimplementation unblocks the API.

Two layers:

- :func:`parse_file_descriptor` — reads the serialized
  FileDescriptorProto (itself plain protobuf wire data; the needed
  subset of descriptor.proto field numbers is fixed and public) into
  message/field/enum metadata.
- :func:`build_module` — synthesizes message classes (kwargs
  construction, attribute get/set, ``SerializeToString`` /
  ``ParseFromString``, repeated fields as lists, submessage defaults,
  enum values exported at file scope) mirroring the slice of the
  generated-code API the pyspark state clients use. No reflection
  (HasField/WhichOneof/CopyFrom) — the clients don't use it.

Proto3 semantics honored: implicit presence (zero-default scalars are
not serialized), unknown fields skipped on parse, repeated scalars
accepted in both packed and unpacked encodings, fields serialized in
field-number order.
"""

from __future__ import annotations

import io
import struct
import types

# FieldDescriptorProto.Type values (public descriptor.proto)
T_DOUBLE, T_FLOAT, T_INT64, T_UINT64, T_INT32 = 1, 2, 3, 4, 5
T_FIXED64, T_FIXED32, T_BOOL, T_STRING, T_GROUP = 6, 7, 8, 9, 10
T_MESSAGE, T_BYTES, T_UINT32, T_ENUM = 11, 12, 13, 14
T_SFIXED32, T_SFIXED64, T_SINT32, T_SINT64 = 15, 16, 17, 18
LABEL_REPEATED = 3

_VARINT_TYPES = {T_INT64, T_UINT64, T_INT32, T_BOOL, T_UINT32, T_ENUM,
                 T_SINT32, T_SINT64}


# ---------------------------------------------------------------------------
# Wire codec
# ---------------------------------------------------------------------------


def write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 10-byte form
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _signed32(v: int) -> int:
    v &= (1 << 32) - 1
    return v - (1 << 32) if v >= (1 << 31) else v


def skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = read_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        n, pos = read_varint(buf, pos)
        pos += n
    elif wire == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    if pos > len(buf):
        raise ValueError("truncated field")
    return pos


# ---------------------------------------------------------------------------
# Descriptor parsing (subset of descriptor.proto, fixed public field
# numbers): FileDescriptorProto{package=2, message_type=4, enum_type=5}
# DescriptorProto{name=1, field=2, nested_type=3, enum_type=4}
# FieldDescriptorProto{name=1, number=3, label=4, type=5, type_name=6}
# EnumDescriptorProto{name=1, value=2}; EnumValueDescriptorProto{name=1,
# number=2}
# ---------------------------------------------------------------------------


class FieldDesc:
    __slots__ = ("name", "number", "label", "type", "type_name")

    def __init__(self):
        self.name = ""
        self.number = 0
        self.label = 1
        self.type = 0
        self.type_name = ""

    @property
    def repeated(self) -> bool:
        return self.label == LABEL_REPEATED


class MessageDesc:
    def __init__(self):
        self.name = ""
        self.full_name = ""
        self.fields: list[FieldDesc] = []
        self.nested: list["MessageDesc"] = []
        self.enums: list["EnumDesc"] = []


class EnumDesc:
    def __init__(self):
        self.name = ""
        self.values: dict[str, int] = {}


def _fields_of(buf: bytes):
    """Iterate (field_number, wire_type, value) over a message blob."""
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        number, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = read_varint(buf, pos)
        elif wire == 2:
            n, pos = read_varint(buf, pos)
            v = buf[pos : pos + n]
            if len(v) != n:
                raise ValueError("truncated length-delimited field")
            pos += n
        elif wire == 1:
            v = buf[pos : pos + 8]
            pos += 8
        elif wire == 5:
            v = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} in descriptor")
        yield number, wire, v


def _parse_enum(buf: bytes) -> EnumDesc:
    e = EnumDesc()
    for num, _w, v in _fields_of(buf):
        if num == 1:
            e.name = v.decode()
        elif num == 2:
            name, value = "", 0
            for n2, _w2, v2 in _fields_of(v):
                if n2 == 1:
                    name = v2.decode()
                elif n2 == 2:
                    value = v2
            e.values[name] = value
    return e


def _parse_field(buf: bytes) -> FieldDesc:
    f = FieldDesc()
    for num, _w, v in _fields_of(buf):
        if num == 1:
            f.name = v.decode()
        elif num == 3:
            f.number = v
        elif num == 4:
            f.label = v
        elif num == 5:
            f.type = v
        elif num == 6:
            f.type_name = v.decode()
    return f


def _parse_message(buf: bytes, prefix: str) -> MessageDesc:
    m = MessageDesc()
    for num, _w, v in _fields_of(buf):
        if num == 1:
            m.name = v.decode()
    m.full_name = f"{prefix}.{m.name}" if prefix else m.name
    for num, _w, v in _fields_of(buf):
        if num == 2:
            m.fields.append(_parse_field(v))
        elif num == 3:
            m.nested.append(_parse_message(v, m.full_name))
        elif num == 4:
            m.enums.append(_parse_enum(v))
    return m


def parse_file_descriptor(blob: bytes):
    """-> (package, [MessageDesc...], [EnumDesc...])"""
    package = ""
    messages: list[MessageDesc] = []
    enums: list[EnumDesc] = []
    for num, _w, v in _fields_of(blob):
        if num == 2:
            package = v.decode()
    for num, _w, v in _fields_of(blob):
        if num == 4:
            messages.append(_parse_message(v, package))
        elif num == 5:
            enums.append(_parse_enum(v))
    return package, messages, enums


# ---------------------------------------------------------------------------
# Dynamic message classes
# ---------------------------------------------------------------------------


def _default_for(field: FieldDesc, registry):
    if field.repeated:
        return []
    if field.type == T_MESSAGE:
        return None  # lazily replaced by a default instance on read
    if field.type == T_STRING:
        return ""
    if field.type == T_BYTES:
        return b""
    if field.type == T_BOOL:
        return False
    if field.type in (T_DOUBLE, T_FLOAT):
        return 0.0
    return 0


class Message:
    """Base for synthesized message classes. Subclasses carry
    ``_FIELDS`` (number -> FieldDesc, sorted), ``_BY_NAME`` and a
    ``_REGISTRY`` mapping .type_name -> class."""

    _FIELDS: dict[int, FieldDesc] = {}
    _BY_NAME: dict[str, FieldDesc] = {}
    _REGISTRY: dict[str, type] = {}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_parent_link", None)
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, name):
        by_name = type(self)._BY_NAME
        if name not in by_name:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        field = by_name[name]
        values = self._values
        if name in values:
            return values[name]
        if field.type == T_MESSAGE and not field.repeated:
            # Default instance carrying a PARENT LINK: real protobuf
            # semantics let callers write `msg.sub.field = x` and have
            # the submessage spring into existence on first SET (the
            # pyspark state clients do exactly this for TTL config:
            # `state_call_command.ttl.durationMs = ...`). Reading alone
            # must NOT mark presence, so attachment happens in
            # __setattr__, recursively up the chain.
            sub = type(self)._REGISTRY[field.type_name]()
            object.__setattr__(sub, "_parent_link", (self, name))
            return sub
        default = _default_for(field, type(self)._REGISTRY)
        if field.repeated:
            values[name] = default  # mutable: persist so appends stick
        return default

    def __setattr__(self, name, value):
        if name not in type(self)._BY_NAME:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        self._values[name] = value
        link = self.__dict__.get("_parent_link")
        if link is not None:
            parent, pname = link
            object.__setattr__(self, "_parent_link", None)
            setattr(parent, pname, self)  # attach (recursive up-chain)

    def __repr__(self):
        inner = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{type(self).__name__}({inner})"

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.SerializeToString() == other.SerializeToString()
        )

    # -- serialization ------------------------------------------------------
    def SerializeToString(self) -> bytes:  # noqa: N802 (protobuf API)
        out = bytearray()
        for number in sorted(type(self)._FIELDS):
            field = type(self)._FIELDS[number]
            if field.name not in self._values:
                continue
            value = self._values[field.name]
            items = value if field.repeated else [value]
            for item in items:
                self._write_field(out, field, item)
        return bytes(out)

    @staticmethod
    def _write_field(out: bytearray, field: FieldDesc, value) -> None:
        t = field.type
        number = field.number
        if t == T_MESSAGE:
            payload = value.SerializeToString()
            write_varint(out, (number << 3) | 2)
            write_varint(out, len(payload))
            out.extend(payload)
            return
        if t in (T_STRING, T_BYTES):
            data = value.encode() if isinstance(value, str) else bytes(value)
            if not data and not field.repeated:
                return  # proto3 implicit presence
            write_varint(out, (number << 3) | 2)
            write_varint(out, len(data))
            out.extend(data)
            return
        if t in _VARINT_TYPES:
            v = int(value)
            if t in (T_SINT32, T_SINT64):
                v = _zigzag(v)
            if v == 0 and not field.repeated:
                return
            write_varint(out, (number << 3) | 0)
            write_varint(out, v)
            return
        if t in (T_DOUBLE, T_FIXED64, T_SFIXED64):
            if value == 0 and not field.repeated:
                return
            write_varint(out, (number << 3) | 1)
            out.extend(
                struct.pack("<d" if t == T_DOUBLE else "<q", value)
                if t != T_FIXED64
                else struct.pack("<Q", value)
            )
            return
        if t in (T_FLOAT, T_FIXED32, T_SFIXED32):
            if value == 0 and not field.repeated:
                return
            write_varint(out, (number << 3) | 5)
            out.extend(
                struct.pack("<f" if t == T_FLOAT else "<i", value)
                if t != T_FIXED32
                else struct.pack("<I", value)
            )
            return
        raise ValueError(f"unsupported field type {t} ({field.name})")

    def ParseFromString(self, data: bytes) -> int:  # noqa: N802
        self._values.clear()
        fields = type(self)._FIELDS
        registry = type(self)._REGISTRY
        pos = 0
        while pos < len(data):
            tag, pos = read_varint(data, pos)
            number, wire = tag >> 3, tag & 7
            field = fields.get(number)
            if field is None:
                pos = skip_field(data, pos, wire)
                continue
            t = field.type
            if wire == 2 and t in _VARINT_TYPES and field.repeated:
                # packed repeated scalars
                n, pos = read_varint(data, pos)
                end = pos + n
                lst = self._values.setdefault(field.name, [])
                while pos < end:
                    v, pos = read_varint(data, pos)
                    lst.append(self._coerce_varint(t, v))
                continue
            value, pos = self._read_field(data, pos, wire, field, registry)
            if field.repeated:
                self._values.setdefault(field.name, []).append(value)
            else:
                self._values[field.name] = value
        return len(data)

    @classmethod
    def _coerce_varint(cls, t: int, v: int):
        if t in (T_SINT32, T_SINT64):
            return _unzigzag(v)
        if t == T_INT64:
            return _signed64(v)
        if t == T_INT32:
            return _signed32(v)
        if t == T_BOOL:
            return bool(v)
        return v

    @classmethod
    def _read_field(cls, data, pos, wire, field, registry):
        t = field.type
        if wire == 0:
            v, pos = read_varint(data, pos)
            return cls._coerce_varint(t, v), pos
        if wire == 2:
            n, pos = read_varint(data, pos)
            raw = data[pos : pos + n]
            if len(raw) != n:
                raise ValueError("truncated length-delimited field")
            pos += n
            if t == T_MESSAGE:
                sub = registry[field.type_name]()
                sub.ParseFromString(raw)
                return sub, pos
            if t == T_STRING:
                return raw.decode("utf-8"), pos
            return bytes(raw), pos
        if wire == 1:
            raw = data[pos : pos + 8]
            pos += 8
            if t == T_DOUBLE:
                return struct.unpack("<d", raw)[0], pos
            if t == T_SFIXED64:
                return struct.unpack("<q", raw)[0], pos
            return struct.unpack("<Q", raw)[0], pos
        if wire == 5:
            raw = data[pos : pos + 4]
            pos += 4
            if t == T_FLOAT:
                return struct.unpack("<f", raw)[0], pos
            if t == T_SFIXED32:
                return struct.unpack("<i", raw)[0], pos
            return struct.unpack("<I", raw)[0], pos
        raise ValueError(f"unsupported wire type {wire}")


def build_module(blob: bytes, module_name: str) -> types.ModuleType:
    """Synthesize a ``_pb2``-style module from a serialized
    FileDescriptorProto: one class per (possibly nested) message, enum
    values exported at module scope (matching generated-code behavior
    for file-level enums) and on their containing class."""
    package, messages, file_enums = parse_file_descriptor(blob)
    mod = types.ModuleType(module_name)
    registry: dict[str, type] = {}

    def declare(mdesc: MessageDesc, container) -> type:
        cls = type(
            mdesc.name,
            (Message,),
            {
                "_FIELDS": {f.number: f for f in mdesc.fields},
                "_BY_NAME": {f.name: f for f in mdesc.fields},
                "_REGISTRY": registry,
                "__module__": module_name,
            },
        )
        # registry keys: fully-qualified type_name with leading dot
        registry[f".{mdesc.full_name}"] = cls
        setattr(container, mdesc.name, cls)
        for e in mdesc.enums:
            for vname, vnum in e.values.items():
                setattr(cls, vname, vnum)
        for nested in mdesc.nested:
            declare(nested, cls)
        return cls

    for mdesc in messages:
        declare(mdesc, mod)
    for e in file_enums:
        for vname, vnum in e.values.items():
            setattr(mod, vname, vnum)  # generated code exports these flat
    mod.__dict__["_PROTOLITE_PACKAGE"] = package
    return mod
