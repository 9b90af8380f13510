"""FORMAT Avro — Avro Object Container Files, read AND write (docs:
interfaces/formats#data-format-avro; Avro spec:
https://avro.apache.org/docs/current/specification/ — public).

Pure-python clean-room implementation (no avro/fastavro dependency in
this environment): OCF = magic ``Obj\\x01`` + file-metadata map
(``avro.schema`` JSON, ``avro.codec``) + 16-byte sync marker, then
blocks of ``count varlong, byte-size varlong, payload, sync``.  Values
use zigzag-varint ints/longs, little-endian floats, length-prefixed
bytes/strings, field-ordered records, block-encoded arrays/maps, and
``union-index varlong + value`` unions.

Self-describing: the embedded schema maps to engine types —
  boolean->Bool, int->Int32, long->Int64, float->Float32,
  double->Float64, string/bytes->String, fixed(n)->FixedString(n),
  enum->String (symbol names), record->named Tuple, array->Array,
  map->Map(String, V), union [null, T]->Nullable(T);
logical types date->Date32, timestamp-millis/micros->DateTime64(3/6),
decimal(bytes|fixed)->Decimal(P, S), uuid->String.  General unions
(two non-null branches) refuse by name — ClickHouse's Avro reader has
the same restriction.  Codecs: null and deflate (stdlib zlib); snappy
refuses by name (library absent by design).

The writer emits the inverse mapping with the null codec —
``INSERT INTO FUNCTION file('x.avro', 'Avro')`` round-trips, and the
output is plain spec-conforming OCF any Avro reader consumes.

Scale: one OCF stream decodes sequentially (blocks are
length-prefixed); parallelism across MANY files via the usual
one-element-one-partition planning.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import BinaryIO, Iterator, List, Optional, Tuple

import pyarrow as pa

from .codec import Block, BlockColumn
from .types import CHType, UnsupportedTypeError, parse_type, to_arrow

MAGIC = b"Obj\x01"


def named_tuple_type(fields: list) -> CHType:
    """CHType for a NAMED Tuple (``[(name, 'Type'), ...]``): the
    writer's record arm needs field names, and ``parse_type`` keeps
    Tuple element names only for Nested — this is the explicit
    constructor (used by Iceberg manifest fixtures and any caller
    writing Avro records)."""
    t = CHType("Tuple")
    for n, ts in fields:
        t.tuple_names.append(n)
        t.tuple_items.append(parse_type(ts))
    t.params = ", ".join(f"{n} {x.name}" for n, x in
                         zip(t.tuple_names, t.tuple_items))
    return t


# ----------------------------------------------------------- primitives


def _read_long(buf: BinaryIO) -> int:
    """Zigzag varint (the Avro int/long wire form)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("EOF inside Avro varint")
        v = b[0]
        acc |= (v & 0x7F) << shift
        if not v & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(buf: BinaryIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_bytes(buf: BinaryIO) -> bytes:
    n = _read_long(buf)
    raw = buf.read(n)
    if len(raw) != n:
        raise EOFError("EOF inside Avro bytes")
    return raw


def _write_bytes(buf: BinaryIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


# -------------------------------------------------------- schema -> CH


def _avro_to_ch(sch, refs: dict) -> Tuple[str, CHType]:
    """Avro schema node -> (avro kind tag, CHType).  The tag drives the
    value decoder; the CHType drives the Arrow rendering."""
    if isinstance(sch, str):
        if sch in refs:
            return refs[sch]
        prim = {
            "boolean": "Bool",
            "int": "Int32",
            "long": "Int64",
            "float": "Float32",
            "double": "Float64",
            "string": "String",
            "bytes": "String",
            "null": None,
        }
        if sch not in prim:
            raise UnsupportedTypeError(f"Avro: unknown type {sch!r}")
        if sch == "null":
            raise UnsupportedTypeError(
                "Avro: bare null type outside a union"
            )
        return sch, parse_type(prim[sch])
    if isinstance(sch, list):
        branches = [s for s in sch if s != "null"]
        if len(branches) != 1 or len(sch) > 2:
            raise UnsupportedTypeError(
                "Avro: only [null, T] unions are supported (general "
                "unions have no single column type — ClickHouse's Avro "
                "reader shares this restriction)"
            )
        tag, t = _avro_to_ch(branches[0], refs)
        nt = CHType(**{**t.__dict__, "nullable": True})
        return ("union0" if sch[0] == "null" else "union1", tag, nt), nt
    if not isinstance(sch, dict):
        raise UnsupportedTypeError(f"Avro: bad schema node {sch!r}")
    typ = sch["type"]
    logical = sch.get("logicalType")
    if logical == "date" and typ == "int":
        return "int", parse_type("Date32")
    if logical == "timestamp-millis" and typ == "long":
        t = parse_type("DateTime64(3)")
        return "long", t
    if logical == "timestamp-micros" and typ == "long":
        t = parse_type("DateTime64(6)")
        return "long", t
    if logical == "uuid":
        return "string", parse_type("String")
    if logical == "decimal" and typ in ("bytes", "fixed"):
        p = int(sch.get("precision", 38))
        s = int(sch.get("scale", 0))
        t = parse_type(f"Decimal({p}, {s})")
        if typ == "fixed":
            return ("decimal-fixed", int(sch["size"]), s), t
        return ("decimal-bytes", None, s), t
    if typ == "record":
        t = CHType("Tuple")
        fields = []
        for f in sch.get("fields", []):
            ftag, ft = _avro_to_ch(f["type"], refs)
            t.tuple_names.append(f["name"])
            t.tuple_items.append(ft)
            fields.append((f["name"], ftag, ft))
        out = ("record", fields)
        if sch.get("name"):
            refs[sch["name"]] = (out, t)
        return out, t
    if typ == "enum":
        out = ("enum", list(sch.get("symbols", [])))
        t = parse_type("String")
        if sch.get("name"):
            refs[sch["name"]] = (out, t)
        return out, t
    if typ == "fixed":
        n = int(sch["size"])
        out = ("fixed", n)
        t = parse_type(f"FixedString({n})")
        if sch.get("name"):
            refs[sch["name"]] = (out, t)
        return out, t
    if typ == "array":
        tag, it = _avro_to_ch(sch["items"], refs)
        t = CHType("Array")
        t.inner = it
        return ("array", tag), t
    if typ == "map":
        tag, vt = _avro_to_ch(sch["values"], refs)
        t = CHType("Map")
        t.tuple_items = [parse_type("String"), vt]
        return ("map", tag), t
    # plain primitive spelled as {"type": "long"} (maybe with ignored
    # logical types like time-millis — decode as the base type)
    return _avro_to_ch(typ, refs)


# ------------------------------------------------------- value decoding


def _decode_value(buf: BinaryIO, tag):
    if tag == "boolean":
        b = buf.read(1)
        if not b:
            raise EOFError("EOF inside Avro boolean")
        return bool(b[0])
    if tag in ("int", "long"):
        return _read_long(buf)
    if tag == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if tag == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if tag == "string":
        return _read_bytes(buf).decode("utf-8")
    if tag == "bytes":
        return _read_bytes(buf).decode("utf-8", "replace")
    if isinstance(tag, tuple):
        kind = tag[0]
        if kind in ("union0", "union1"):
            idx = _read_long(buf)
            null_idx = 0 if kind == "union0" else 1
            if idx == null_idx:
                return None
            return _decode_value(buf, tag[1])
        if kind == "record":
            return {
                name: _decode_value(buf, ftag)
                for name, ftag, _ft in tag[1]
            }
        if kind == "enum":
            idx = _read_long(buf)
            syms = tag[1]
            if not 0 <= idx < len(syms):
                raise ValueError(f"Avro enum index {idx} out of range")
            return syms[idx]
        if kind == "fixed":
            raw = buf.read(tag[1])
            if len(raw) != tag[1]:
                raise EOFError("EOF inside Avro fixed")
            return raw.decode("utf-8", "replace")
        if kind == "decimal-bytes" or kind == "decimal-fixed":
            import decimal as _dec

            raw = (
                buf.read(tag[1])
                if kind == "decimal-fixed"
                else _read_bytes(buf)
            )
            unscaled = int.from_bytes(raw, "big", signed=True)
            return _dec.Decimal(unscaled).scaleb(-tag[2])
        if kind == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)  # byte size hint, unused
                    n = -n
                for _ in range(n):
                    out.append(_decode_value(buf, tag[1]))
        if kind == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode_value(buf, tag[1])
    raise UnsupportedTypeError(f"Avro: undecodable tag {tag!r}")


def _to_py_for_arrow(v, t: CHType):
    """Adapt decoded python values to the engine's Arrow carriers."""
    import datetime

    if v is None:
        return None
    b = t.base
    if b == "Date32":
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
    if b == "DateTime64":
        us = v * (10 ** (6 - t.scale)) if t.scale <= 6 else v // 10 ** (
            t.scale - 6
        )
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=us
        )
    if b == "Bool":
        return bool(v)
    if b == "Array":
        return [_to_py_for_arrow(x, t.inner) for x in v]
    if b == "Map":
        return {
            k: _to_py_for_arrow(x, t.tuple_items[1]) for k, x in v.items()
        }
    if b == "Tuple":
        return {
            (t.tuple_names[i] if t.tuple_names else f"_{i + 1}"): (
                _to_py_for_arrow(v[t.tuple_names[i]], it)
                if t.tuple_names
                else _to_py_for_arrow(v[i], it)
            )
            for i, it in enumerate(t.tuple_items)
        }
    if b == "FixedString":
        return v
    return v


def _tuple_arrow(t: CHType) -> pa.DataType:
    """Arrow type honoring record field NAMES (to_arrow's Tuple arm
    uses positional _1.._n)."""
    if t.base == "Tuple" and t.tuple_names:
        return pa.struct(
            [
                pa.field(n, _tuple_arrow(it))
                for n, it in zip(t.tuple_names, t.tuple_items)
            ]
        )
    if t.base == "Array":
        return pa.list_(_tuple_arrow(t.inner))
    if t.base == "Map":
        return pa.map_(pa.string(), _tuple_arrow(t.tuple_items[1]))
    return to_arrow(CHType(**{**t.__dict__, "nullable": False}))


def iter_avro_blocks(
    buf: BinaryIO,
    *,
    lossy_uint64: bool = False,
    block_rows: int = 65_536,
) -> Iterator[Block]:
    """Decode an Avro Object Container File into Blocks."""
    magic = buf.read(4)
    if magic != MAGIC:
        raise ValueError(
            f"not an Avro object container file (magic {magic!r})"
        )
    meta: dict = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise UnsupportedTypeError(
            f"Avro codec {codec!r} is not supported (null/deflate only "
            "— snappy needs a library this environment omits by design)"
        )
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    refs: dict = {}
    tag, root_t = _avro_to_ch(schema, refs)
    if not (isinstance(tag, tuple) and tag[0] == "record"):
        raise UnsupportedTypeError(
            "Avro: the file's root schema must be a record (ClickHouse "
            "reads Avro tables the same way)"
        )
    fields = tag[1]  # (name, tag, CHType)

    pending: list = []

    def flush():
        cols = []
        for i, (name, _ftag, ft) in enumerate(fields):
            at = _tuple_arrow(ft) if ft.base in (
                "Tuple", "Array", "Map"
            ) else to_arrow(CHType(**{**ft.__dict__, "nullable": False}))
            cols.append(
                BlockColumn(
                    name,
                    ft.name,
                    ft,
                    pa.array([r[i] for r in pending], type=at),
                )
            )
        return Block(n_rows=len(pending), columns=cols)

    while True:
        head = buf.read(1)
        if not head:
            break
        # finish the count varint using the 1 peeked byte + the stream
        acc, shift = head[0] & 0x7F, 7
        b0 = head[0]
        while b0 & 0x80:
            nb = buf.read(1)
            if not nb:
                raise EOFError("EOF inside Avro block count")
            b0 = nb[0]
            acc |= (b0 & 0x7F) << shift
            shift += 7
        count = (acc >> 1) ^ -(acc & 1)
        size = _read_long(buf)
        payload = buf.read(size)
        if len(payload) != size:
            raise EOFError("EOF inside Avro block payload")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        got_sync = buf.read(16)
        if got_sync != sync:
            raise ValueError("Avro block sync marker mismatch")
        pb = io.BytesIO(payload)
        for _ in range(count):
            row = [
                _to_py_for_arrow(_decode_value(pb, ftag), ft)
                for _name, ftag, ft in fields
            ]
            pending.append(row)
            if len(pending) >= block_rows:
                yield flush()
                pending = []
    # always emit a final (possibly empty) block so the schema is
    # discoverable from a zero-row file
    yield flush()


# ----------------------------------------------------------- the writer


def _ch_to_avro_schema(name: str, t: CHType) -> dict:
    nullable = t.nullable
    inner = CHType(**{**t.__dict__, "nullable": False})
    b = inner.base
    prim = {
        "Bool": "boolean",
        "Int8": "int",
        "Int16": "int",
        "Int32": "int",
        "UInt8": "int",
        "UInt16": "int",
        "Int64": "long",
        "UInt32": "long",
        "UInt64": "long",
        "Float32": "float",
        "Float64": "double",
        "String": "string",
        "FixedString": "string",
        "Enum8": "string",
        "Enum16": "string",
        "UUID": "string",
        "IPv4": "string",
        "IPv6": "string",
        "JSON": "string",
    }
    if b in prim:
        sch: object = prim[b]
    elif b == "Date" or b == "Date32":
        sch = {"type": "int", "logicalType": "date"}
    elif b == "DateTime" or b == "DateTime64":
        sch = {"type": "long", "logicalType": "timestamp-micros"}
    elif b in ("Decimal", "Decimal32", "Decimal64", "Decimal128"):
        sch = {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": inner.fixed_len,
            "scale": inner.scale,
        }
    elif b == "Array":
        sch = {
            "type": "array",
            "items": _ch_to_avro_schema(name + "_item", inner.inner)[
                "type"
            ],
        }
    elif b == "Map":
        sch = {
            "type": "map",
            "values": _ch_to_avro_schema(
                name + "_value", inner.tuple_items[1]
            )["type"],
        }
    elif b == "Tuple" and inner.tuple_names:
        sch = {
            "type": "record",
            "name": f"{name}_r",
            "fields": [
                _ch_to_avro_schema(fn, ft)
                for fn, ft in zip(inner.tuple_names, inner.tuple_items)
            ],
        }
    else:
        raise UnsupportedTypeError(
            f"Avro writer: no mapping for {t.name!r}"
        )
    if nullable:
        sch = ["null", sch]
    return {"name": name, "type": sch}


def _encode_value(buf: BinaryIO, v, t: CHType) -> None:
    import datetime
    import decimal as _dec

    if t.nullable:
        if v is None:
            _write_long(buf, 0)
            return
        _write_long(buf, 1)
        t = CHType(**{**t.__dict__, "nullable": False})
    b = t.base
    if b == "Bool":
        buf.write(b"\x01" if v else b"\x00")
    elif b in ("Int8", "Int16", "Int32", "UInt8", "UInt16", "Int64",
               "UInt32", "UInt64"):
        _write_long(buf, int(v))
    elif b == "Float32":
        buf.write(struct.pack("<f", float(v)))
    elif b == "Float64":
        buf.write(struct.pack("<d", float(v)))
    elif b in ("String", "FixedString", "Enum8", "Enum16", "UUID",
               "IPv4", "IPv6", "JSON"):
        _write_bytes(buf, (v or "").encode("utf-8"))
    elif b in ("Date", "Date32"):
        _write_long(buf, (v - datetime.date(1970, 1, 1)).days)
    elif b in ("DateTime", "DateTime64"):
        if isinstance(v, datetime.datetime):
            delta = v.replace(tzinfo=None) - datetime.datetime(1970, 1, 1)
            us = delta // datetime.timedelta(microseconds=1)
        else:
            us = int(v)
        _write_long(buf, us)
    elif b in ("Decimal", "Decimal32", "Decimal64", "Decimal128"):
        q = _dec.Decimal(v).scaleb(t.scale).to_integral_value()
        unscaled = int(q)
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        _write_bytes(buf, unscaled.to_bytes(nbytes, "big", signed=True))
    elif b == "Array":
        vals = list(v or [])
        if vals:
            _write_long(buf, len(vals))
            for x in vals:
                _encode_value(buf, x, t.inner)
        _write_long(buf, 0)
    elif b == "Map":
        items = dict(v or {})
        if items:
            _write_long(buf, len(items))
            for k, x in items.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                _encode_value(buf, x, t.tuple_items[1])
        _write_long(buf, 0)
    elif b == "Tuple" and t.tuple_names:
        for fn, ft in zip(t.tuple_names, t.tuple_items):
            _encode_value(buf, (v or {}).get(fn), ft)
    else:
        raise UnsupportedTypeError(f"Avro writer: no encoder for {t.name!r}")


def write_avro(
    buf: BinaryIO, batches, ch_types: Optional[List[CHType]] = None
) -> int:
    """Encode Arrow RecordBatches as one Avro OCF (null codec)."""
    import os as _os

    from .rowbinary import derive_wire_types

    batches, ch_types = derive_wire_types(batches, ch_types)
    batches = list(batches)
    names = (
        [f.name for f in batches[0].schema] if batches else
        [f"c{i + 1}" for i in range(len(ch_types))]
    )
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            _ch_to_avro_schema(n, t) for n, t in zip(names, ch_types)
        ],
    }
    sync = _os.urandom(16)
    buf.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    _write_long(buf, len(meta))
    for k, v in meta.items():
        _write_bytes(buf, k.encode())
        _write_bytes(buf, v)
    _write_long(buf, 0)
    buf.write(sync)
    rows = 0
    for batch in batches:
        if batch.num_rows == 0:
            continue
        payload = io.BytesIO()
        cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
        for r in range(batch.num_rows):
            for c, t in enumerate(ch_types):
                _encode_value(payload, cols[c][r], t)
        raw = payload.getvalue()
        _write_long(buf, batch.num_rows)
        _write_long(buf, len(raw))
        buf.write(raw)
        buf.write(sync)
        rows += batch.num_rows
    return rows
