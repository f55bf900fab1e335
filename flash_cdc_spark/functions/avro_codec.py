"""Pure-Python Avro binary codec (Apache Avro binary encoding spec).

Implements the subset of the public Avro specification
(https://avro.apache.org/docs/1.11.1/specification/#binary-encoding)
needed for change-event payloads: null, boolean, int, long (zigzag
varint), float, double (little-endian IEEE 754), string, bytes, record,
enum, array, map, union, fixed.

Why this exists: the runtime container has neither the spark-avro jar
(offline — P1's ``from_avro`` fast path can never execute there) nor a
Python Avro library. This codec makes the Avro branch executable
anywhere: encode/decode run inside Arrow-batched pandas UDFs (see
``decode_envelope(use_avro="python")`` in
:mod:`flash_cdc_spark.sources.registry`) and the roundtrip test runs
unconditionally instead of skipping.

Reference parity: ``app/services/sf_pubsub.py:308-330`` decodes each
event's Avro payload with a per-schema-id cache; here the same decode
is a vectorized Arrow batch, executor-side, never a driver loop. When
the spark-avro jar IS on the classpath, ``use_avro="jvm"`` remains the
fast path — this codec is the correctness-preserving fallback.

Limitations (documented, not silent): logical types are passed through
as their base types; ``bytes``/``fixed`` decode to Python ``bytes``,
which the JSON bridge in the registry cannot carry (none of the
registered envelope schemas use them).
"""

from __future__ import annotations

import json
import struct as _struct
from typing import Any

__all__ = ["parse_schema", "encode", "decode", "zigzag_encode", "zigzag_decode"]

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def parse_schema(schema_json: str | dict | list) -> Any:
    """Parse an Avro schema (JSON string or already-loaded structure)
    and resolve named-type references into a self-contained tree."""
    schema = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    names: dict[str, Any] = {}

    def _resolve(s: Any) -> Any:
        if isinstance(s, str):
            if s in _PRIMITIVES:
                return s
            if s in names:
                return names[s]
            raise ValueError(f"unknown type reference {s!r}")
        if isinstance(s, list):  # union
            return [_resolve(b) for b in s]
        t = s["type"]
        if t in ("record", "enum", "fixed"):
            names[s["name"]] = s
            if t == "record":
                s["fields"] = [
                    {**f, "type": _resolve(f["type"])} for f in s["fields"]
                ]
            return s
        if t == "array":
            return {**s, "items": _resolve(s["items"])}
        if t == "map":
            return {**s, "values": _resolve(s["values"])}
        return _resolve(t)  # e.g. {"type": "string"}

    return _resolve(schema)


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_long(out: bytearray, n: int) -> None:
    _write_varint(out, zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF)


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(acc), pos
        shift += 7


def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _union_branch(schema: list, value: Any) -> int:
    """Pick the union branch for a Python value. Only NULLABLE unions
    (null + exactly one other branch) are supported — the shape every
    change-event schema uses. A wider union is rejected loudly: picking
    'first non-null branch' would silently re-type the value (e.g. a
    long written through the string branch of ["null","string","long"])
    and corrupt data instead of erroring."""
    non_null = [i for i, b in enumerate(schema) if _type_name(b) != "null"]
    if len(non_null) > 1:
        raise ValueError(
            f"unsupported multi-branch union {schema!r}: only nullable "
            "unions (null + one type) are implemented"
        )
    if value is None:
        for i, b in enumerate(schema):
            if _type_name(b) == "null":
                return i
    elif non_null:
        return non_null[0]
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def encode(schema: Any, value: Any) -> bytes:
    out = bytearray()
    _encode(schema, value, out)
    return bytes(out)


def _encode(schema: Any, value: Any, out: bytearray) -> None:
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out += _struct.pack("<f", float(value))
    elif t == "double":
        out += _struct.pack("<d", float(value))
    elif t == "string":
        raw = str(value).encode("utf-8")
        _write_long(out, len(raw))
        out += raw
    elif t in ("bytes",):
        _write_long(out, len(value))
        out += bytes(value)
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out += bytes(value)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "union":
        i = _union_branch(schema, value)
        _write_long(out, i)
        _encode(schema[i], value, out)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _encode("string", k, out)
                _encode(schema["values"], v, out)
        _write_long(out, 0)
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]) if value else None, out)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def decode(schema: Any, data: bytes) -> Any:
    value, pos = _decode(schema, data, 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes: consumed {pos} of {len(data)}")
    return value


def _decode(schema: Any, data: bytes, pos: int) -> tuple[Any, int]:
    t = _type_name(schema)
    if t == "null":
        return None, pos
    if t == "boolean":
        return data[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _read_long(data, pos)
    if t == "float":
        return _struct.unpack_from("<f", data, pos)[0], pos + 4
    if t == "double":
        return _struct.unpack_from("<d", data, pos)[0], pos + 8
    if t == "string":
        n, pos = _read_long(data, pos)
        return data[pos : pos + n].decode("utf-8"), pos + n
    if t == "bytes":
        n, pos = _read_long(data, pos)
        return bytes(data[pos : pos + n]), pos + n
    if t == "fixed":
        n = schema["size"]
        return bytes(data[pos : pos + n]), pos + n
    if t == "enum":
        i, pos = _read_long(data, pos)
        return schema["symbols"][i], pos
    if t == "union":
        i, pos = _read_long(data, pos)
        return _decode(schema[i], data, pos)
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(data, pos)
            if n == 0:
                return out, pos
            if n < 0:  # negative block count: block byte-size follows
                _, pos = _read_long(data, pos)
                n = -n
            for _ in range(n):
                item, pos = _decode(schema["items"], data, pos)
                out.append(item)
    if t == "map":
        out_m: dict[str, Any] = {}
        while True:
            n, pos = _read_long(data, pos)
            if n == 0:
                return out_m, pos
            if n < 0:
                _, pos = _read_long(data, pos)
                n = -n
            for _ in range(n):
                k, pos = _decode("string", data, pos)
                v, pos = _decode(schema["values"], data, pos)
                out_m[k] = v
    if t == "record":
        rec: dict[str, Any] = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(f["type"], data, pos)
        return rec, pos
    raise ValueError(f"unsupported Avro type {t!r}")
