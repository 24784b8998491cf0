"""Pure-Python Avro-binary and Protobuf wire-format codecs.

Reference parity: flink-formats/flink-avro
(AvroFormatFactory.java:55, AvroRowDataDeserializationSchema) and
flink-formats/flink-protobuf (PbFormatFactory) decode these formats
JVM-side. On Spark the fast path is the spark-avro / spark-protobuf
modules (sources/connectors.py, classpath-gated). THIS module is the
dependency-free fallback that makes the formats actually exercisable
in any environment: hand-rolled codecs for the documented wire formats
(Avro spec §binary encoding; protobuf encoding docs), wired through
`mapInPandas`.

Scope (the subset CDC/event payloads actually use):
- Avro: null/boolean/int/long/float/double/string/bytes, records of
  them, `[null, T]` nullable unions, arrays of primitives.
- Protobuf: varint (int32/int64/bool), zigzag sint64, fixed64 double,
  fixed32 float, length-delimited string/bytes, repeated scalar fields
  (packed or not).

Scale note: this is a per-row Python decode (~µs/row) — an order of
magnitude slower than the JVM modules. It exists for correctness parity
and jar-less environments; at 100 TB put spark-avro/spark-protobuf on
the classpath and keep the same call sites (decode_avro/
decode_protobuf in sources/connectors.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

# --------------------------------------------------------------- Avro

_AVRO_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "string", "bytes"}


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
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


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _avro_write(out: bytearray, typ, value) -> None:
    if isinstance(typ, list):  # union — Avro encodes the branch index first
        idx = 0 if value is None else next(
            i for i, t in enumerate(typ) if t != "null"
        )
        _write_varint(out, _zigzag_encode(idx))
        if value is not None:
            _avro_write(out, typ[idx], value)
        return
    if isinstance(typ, dict):
        if typ["type"] == "record":
            for f in typ["fields"]:
                _avro_write(out, f["type"], value[f["name"]])
            return
        if typ["type"] == "array":
            if value:
                _write_varint(out, _zigzag_encode(len(value)))
                for item in value:
                    _avro_write(out, typ["items"], item)
            _write_varint(out, 0)  # end-of-blocks marker
            return
        raise NotImplementedError(f"avro type {typ['type']}")
    if typ == "null":
        return
    if typ == "boolean":
        out.append(1 if value else 0)
    elif typ in ("int", "long"):
        _write_varint(out, _zigzag_encode(int(value)))
    elif typ == "float":
        out.extend(struct.pack("<f", float(value)))
    elif typ == "double":
        out.extend(struct.pack("<d", float(value)))
    elif typ in ("string", "bytes"):
        raw = value.encode("utf-8") if typ == "string" else bytes(value)
        _write_varint(out, _zigzag_encode(len(raw)))
        out.extend(raw)
    else:
        raise NotImplementedError(f"avro type {typ}")


def _avro_read(buf: bytes, pos: int, typ):
    if isinstance(typ, list):  # union
        idx, pos = _read_varint(buf, pos)
        idx = _zigzag_decode(idx)
        branch = typ[idx]
        if branch == "null":
            return None, pos
        return _avro_read(buf, pos, branch)
    if isinstance(typ, dict):
        if typ["type"] == "record":
            rec = {}
            for f in typ["fields"]:
                rec[f["name"]], pos = _avro_read(buf, pos, f["type"])
            return rec, pos
        if typ["type"] == "array":
            items = []
            while True:
                n, pos = _read_varint(buf, pos)
                n = _zigzag_decode(n)
                if n == 0:
                    return items, pos
                if n < 0:  # block with byte-size prefix (spec-allowed)
                    _, pos = _read_varint(buf, pos)
                    n = -n
                for _ in range(n):
                    item, pos = _avro_read(buf, pos, typ["items"])
                    items.append(item)
        raise NotImplementedError(f"avro type {typ['type']}")
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        n, pos = _read_varint(buf, pos)
        return _zigzag_decode(n), pos
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("string", "bytes"):
        n, pos = _read_varint(buf, pos)
        n = _zigzag_decode(n)
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    raise NotImplementedError(f"avro type {typ}")


def avro_encode(schema: dict, record: dict) -> bytes:
    """Encode one record against an Avro record schema (plain dict form
    of the JSON schema, e.g. {"type": "record", "fields": [...]})."""
    out = bytearray()
    _avro_write(out, schema, record)
    return bytes(out)


def avro_decode(schema: dict, data: bytes) -> dict:
    rec, pos = _avro_read(bytes(data), 0, schema)
    if pos != len(data):
        raise ValueError(f"trailing bytes: consumed {pos} of {len(data)}")
    return rec


def decode_avro_python(
    df: DataFrame, value_col: str, schema: dict, output_schema: str
) -> DataFrame:
    """Decode a binary Avro column into typed columns via mapInPandas
    (the jar-less sibling of sources/connectors.decode_avro)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame([avro_decode(schema, v) for v in pdf[value_col]])

    return df.mapInPandas(run, output_schema)


# ----------------------------------------------------------- Protobuf

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5

_PB_WIRETYPE = {
    "int32": _WT_VARINT,
    "int64": _WT_VARINT,
    "uint64": _WT_VARINT,
    "bool": _WT_VARINT,
    "sint64": _WT_VARINT,
    "double": _WT_I64,
    "float": _WT_I32,
    "string": _WT_LEN,
    "bytes": _WT_LEN,
}


def _pb_write_scalar(out: bytearray, typ: str, value) -> None:
    if typ in ("int32", "int64", "uint64"):
        _write_varint(out, int(value) & 0xFFFFFFFFFFFFFFFF)
    elif typ == "bool":
        _write_varint(out, 1 if value else 0)
    elif typ == "sint64":
        _write_varint(out, _zigzag_encode(int(value)))
    elif typ == "double":
        out.extend(struct.pack("<d", float(value)))
    elif typ == "float":
        out.extend(struct.pack("<f", float(value)))
    elif typ in ("string", "bytes"):
        raw = value.encode("utf-8") if typ == "string" else bytes(value)
        _write_varint(out, len(raw))
        out.extend(raw)
    else:
        raise NotImplementedError(f"protobuf type {typ}")


def pb_encode(schema: dict[int, tuple[str, str]], message: dict) -> bytes:
    """Encode a message. `schema` maps field number -> (name, type);
    type may be prefixed 'repeated ' for repeated scalar fields (encoded
    unpacked, one tag per element — always valid on the wire)."""
    out = bytearray()
    for num, (name, typ) in sorted(schema.items()):
        if name not in message or message[name] is None:
            continue  # proto3: absent/default fields are omitted
        repeated = typ.startswith("repeated ")
        base = typ.removeprefix("repeated ")
        values = message[name] if repeated else [message[name]]
        for v in values:
            _write_varint(out, (num << 3) | _PB_WIRETYPE[base])
            _pb_write_scalar(out, base, v)
    return bytes(out)


def _pb_read_scalar(buf: bytes, pos: int, typ: str, wt: int):
    if wt == _WT_VARINT:
        n, pos = _read_varint(buf, pos)
        if typ == "sint64":
            return _zigzag_decode(n), pos
        if typ == "bool":
            return bool(n), pos
        if typ in ("int32", "int64"):
            # two's-complement back to signed
            if n >= 1 << 63:
                n -= 1 << 64
            return n, pos
        return n, pos
    if wt == _WT_I64:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if wt == _WT_I32:
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if wt == _WT_LEN:
        n, pos = _read_varint(buf, pos)
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    raise NotImplementedError(f"wire type {wt}")


def pb_decode(schema: dict[int, tuple[str, str]], data: bytes) -> dict:
    """Decode a message; unknown fields are skipped (protobuf's forward
    compatibility contract). Repeated fields accept both unpacked and
    packed (length-delimited varint block) encodings."""
    buf = bytes(data)
    out: dict = {}
    for num, (name, typ) in schema.items():
        if typ.startswith("repeated "):
            out[name] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wt = tag >> 3, tag & 0x7
        field = schema.get(num)
        if field is None:  # unknown field — skip by wire type
            if wt == _WT_VARINT:
                _, pos = _read_varint(buf, pos)
            elif wt == _WT_I64:
                pos += 8
            elif wt == _WT_I32:
                pos += 4
            elif wt == _WT_LEN:
                n, pos = _read_varint(buf, pos)
                pos += n
            else:
                raise NotImplementedError(f"wire type {wt}")
            continue
        name, typ = field
        repeated = typ.startswith("repeated ")
        base = typ.removeprefix("repeated ")
        if repeated and wt == _WT_LEN and _PB_WIRETYPE[base] == _WT_VARINT:
            # packed repeated varints
            n, pos = _read_varint(buf, pos)
            end = pos + n
            while pos < end:
                v, pos = _pb_read_scalar(buf, pos, base, _WT_VARINT)
                out[name].append(v)
            continue
        v, pos = _pb_read_scalar(buf, pos, base, wt)
        if repeated:
            out[name].append(v)
        else:
            out[name] = v
    for num, (name, typ) in schema.items():
        out.setdefault(name, None if not typ.startswith("repeated ") else [])
    return out


def decode_protobuf_python(
    df: DataFrame, value_col: str, schema: dict[int, tuple[str, str]], output_schema: str
) -> DataFrame:
    """Decode a binary protobuf column into typed columns via
    mapInPandas (jar-less sibling of sources/connectors.decode_protobuf)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame([pb_decode(schema, v) for v in pdf[value_col]])

    return df.mapInPandas(run, output_schema)
