"""AggregateFunction(f, T...) state-blob codec.

ClickHouse's AggregatingMergeTree stores *partial aggregation states*
as columns: ``AggregateFunction(sum, UInt64)`` rows are the function's
serialized accumulator, written by ``IAggregateFunction::serialize``
and merged/finalized later with the ``-Merge`` / ``-State`` combinator
machinery (docs: sql-reference/data-types/aggregatefunction).  The
reference extension refuses these columns (they hit the
``<unsupported:T>`` arm at lib.rs:168-170); this engine decodes the
COMMON function family so a user can read an AggregatingMergeTree
export, merge states across parts with ordinary Spark aggregates, and
finalize — all without re-scanning the raw data.

Clean-room layouts, re-expressed from ClickHouse's public sources (the
serialize/deserialize pairs; file names cited per function below).
Layouts are per-VALUE self-delimiting, so a column of ``rows`` states
is decoded sequentially exactly like every other Native column.  The
layouts are stable in modern ClickHouse but ARE an internal surface —
``tests/test_live_clickhouse.py`` carries an env-gated case that
round-trips states against a real server, which is where any framing
drift shows up.

Supported functions and their wire layout (one value):

* ``count`` — varuint of the count
  (AggregateFunctionCount.h: ``writeVarUInt(count)``).
* ``sum(T)`` / ``sumWithOverflow(T)`` — the raw accumulator value,
  little-endian.  ``sum`` widens (UInt*->UInt64, Int*->Int64,
  Float*->Float64, Decimal(P,S)->Decimal128(S)); ``sumWithOverflow``
  keeps T (AggregateFunctionSum.h: ``writeBinaryLittleEndian(sum)``).
* ``avg(T)`` — numerator (widened, raw LE) then denominator varuint
  (AggregateFunctionAvg.h: ``writeBinaryLittleEndian(numerator);
  writeVarUInt(denominator)``).
* ``min(T)`` / ``max(T)`` / ``any(T)`` / ``anyLast(T)`` —
  SingleValueData: fixed-width T is a 1-byte has-flag then the raw
  value; String is an Int32 byte length (-1 = no value) then the raw
  bytes (SingleValueData.cpp).  Decodes to a NULLABLE value (no-value
  state -> NULL).
* ``uniqExact(T)`` — varuint set size then the raw fixed-width
  elements (HashSet::write).  Fixed-width T only: ClickHouse's String
  arm stores 128-bit sipHashes, which cannot be surfaced as values.
  Decodes to a SORTED array<T> (hash-table dump order is
  nondeterministic; a set has no order to preserve).
* ``groupBitAnd/Or/Xor(T)`` — the raw value of T
  (AggregateFunctionBitwise.h).
* ``argMin(R, C)`` / ``argMax(R, C)`` — the R SingleValueData then the
  C SingleValueData (AggregateFunctionArgMinMax.h).  Decodes to
  struct<result, comparison> with nullable fields.

Anything else (parametrized functions like ``quantiles(0.5)``,
combinators like ``sumIf``, sketch states like ``uniq``) keeps the
loud named refusal in types.py.

Scale note: decode/encode here loop per state value in Python — fine
by design, because AggregateFunction columns are POST-aggregation
(cardinality = group count, not raw-row count); the raw-row work
happened before the states were written.  ``sum``/``groupBit*`` states
are a contiguous plain column and take the vectorized codec path.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import BinaryIO

import numpy as np
import pyarrow as pa

from .types import FIXED_WIDTH, CHType, UnsupportedTypeError, parse_type

_SINGLE_VALUE_FUNCS = ("min", "max", "any", "anyLast")
_BIT_FUNCS = ("groupBitAnd", "groupBitOr", "groupBitXor")
SUPPORTED_FUNCS = (
    ("count", "sum", "sumWithOverflow", "avg", "uniqExact", "argMin", "argMax")
    + _SINGLE_VALUE_FUNCS
    + _BIT_FUNCS
)
_CANON = {f.lower(): f for f in SUPPORTED_FUNCS}


@dataclass
class AggSpec:
    """Parsed AggregateFunction(f, T...) spec."""

    func: str  # canonical spelling, e.g. 'sum', 'anyLast'
    args: list = field(default_factory=list)  # argument CHTypes


def _value_width(t: CHType) -> int:
    """Byte width of one raw value of ``t`` on the wire, for the
    fixed-width sub-layouts (SingleValueData / uniqExact elements)."""
    if t.base in FIXED_WIDTH:
        return FIXED_WIDTH[t.base][1]
    if t.base == "Decimal32":
        return 4
    if t.base == "Decimal64":
        return 8
    if t.base == "Decimal128":
        return 16
    if t.base == "Decimal":
        p = t.fixed_len
        return 4 if p <= 9 else (8 if p <= 18 else 16)
    raise UnsupportedTypeError(
        f"AggregateFunction over {t.name!r} needs a fixed-width or "
        "String argument"
    )


def _widened(t: CHType) -> CHType:
    """The sum/avg accumulator type for argument type ``t`` (ClickHouse
    NearestFieldType widening)."""
    b = t.base
    if b in ("UInt8", "UInt16", "UInt32", "UInt64", "Bool"):
        return parse_type("UInt64")
    if b in ("Int8", "Int16", "Int32", "Int64", "Enum8", "Enum16"):
        return parse_type("Int64")
    if b in ("Float32", "Float64"):
        return parse_type("Float64")
    if b in ("Decimal", "Decimal32", "Decimal64", "Decimal128"):
        return parse_type(f"Decimal(38, {t.scale})")
    raise UnsupportedTypeError(
        f"sum/avg accumulator undefined for argument type {t.name!r}"
    )


def parse_agg_spec(params: str) -> AggSpec:
    """Parse the inside of ``AggregateFunction(...)``; raises
    UnsupportedTypeError (by name) for anything outside the supported
    family — types.py turns that into the documented refusal."""
    from .types import _split_top_level

    parts = [p.strip() for p in _split_top_level(params)]
    if not parts or not parts[0]:
        raise UnsupportedTypeError(
            f"AggregateFunction needs (function, types...): {params!r}"
        )
    fname = parts[0]
    if "(" in fname:
        raise UnsupportedTypeError(
            f"parametrized aggregate function states are not decodable "
            f"({fname!r}); supported: {', '.join(SUPPORTED_FUNCS)}"
        )
    canon = _CANON.get(fname.lower())
    if canon is None:
        raise UnsupportedTypeError(
            f"aggregate function state {fname!r} is not in the decodable "
            f"family; supported: {', '.join(SUPPORTED_FUNCS)}"
        )
    args = [parse_type(p) for p in parts[1:]]
    for a in args:
        if a.nullable:
            raise UnsupportedTypeError(
                "AggregateFunction over Nullable arguments is not "
                f"supported: AggregateFunction({params})"
            )
    if canon == "count":
        if len(args) > 1:
            raise UnsupportedTypeError(
                f"count takes at most one argument: ({params})"
            )
    elif canon in ("argMin", "argMax"):
        if len(args) != 2:
            raise UnsupportedTypeError(
                f"{canon} needs exactly (result, comparison) argument "
                f"types: ({params})"
            )
        for a in args:
            if a.base != "String":
                _value_width(a)
    else:
        if len(args) != 1:
            raise UnsupportedTypeError(
                f"{canon} needs exactly one argument type: ({params})"
            )
        t = args[0]
        if canon in ("sum", "avg"):
            _widened(t)  # validates
        elif canon == "sumWithOverflow":
            _value_width(t)
        elif canon == "uniqExact":
            if t.base == "String":
                raise UnsupportedTypeError(
                    "uniqExact(String) states store 128-bit sipHashes, "
                    "not values — they cannot be surfaced; use a "
                    "fixed-width argument or re-aggregate from raw data"
                )
            _value_width(t)
        elif canon in _BIT_FUNCS:
            if t.base not in (
                "UInt8", "UInt16", "UInt32", "UInt64",
                "Int8", "Int16", "Int32", "Int64",
            ):
                raise UnsupportedTypeError(
                    f"{canon} needs an integer argument type: ({params})"
                )
        elif canon in _SINGLE_VALUE_FUNCS:
            if t.base != "String":
                _value_width(t)
    return AggSpec(canon, args)


def arrow_type(spec: AggSpec, *, lossy_uint64: bool = False) -> pa.DataType:
    from .types import to_arrow

    f = spec.func
    if f == "count":
        return pa.int64()
    if f in ("sum", "avg"):
        num = to_arrow(_widened(spec.args[0]), lossy_uint64=lossy_uint64)
        if f == "sum":
            return num
        return pa.struct(
            [pa.field("numerator", num), pa.field("denominator", pa.int64())]
        )
    if f == "sumWithOverflow" or f in _BIT_FUNCS:
        return to_arrow(spec.args[0], lossy_uint64=lossy_uint64)
    if f in _SINGLE_VALUE_FUNCS:
        return to_arrow(spec.args[0], lossy_uint64=lossy_uint64)
    if f == "uniqExact":
        return pa.list_(to_arrow(spec.args[0], lossy_uint64=lossy_uint64))
    if f in ("argMin", "argMax"):
        return pa.struct(
            [
                pa.field(
                    "result",
                    to_arrow(spec.args[0], lossy_uint64=lossy_uint64),
                ),
                pa.field(
                    "comparison",
                    to_arrow(spec.args[1], lossy_uint64=lossy_uint64),
                ),
            ]
        )
    raise UnsupportedTypeError(f"no arrow mapping for agg state {f!r}")


def _decode_dense(
    raw: bytes, t: CHType, n: int, *, scrub_strings: bool, lossy_uint64: bool
) -> pa.Array:
    """Render ``n`` contiguous raw values of ``t`` through the shared
    column codec (identical Date/Decimal/UInt64 semantics)."""
    from .codec import decode_column

    return decode_column(
        io.BytesIO(raw), t, n,
        scrub_strings=scrub_strings, lossy_uint64=lossy_uint64,
    )


def _read_exact(buf: BinaryIO, n: int, what: str) -> bytes:
    raw = buf.read(n)
    if len(raw) != n:
        raise EOFError(f"EOF inside {what}")
    return raw


def _decode_single_values(
    buf: BinaryIO,
    t: CHType,
    rows: int,
    *,
    scrub_strings: bool,
    lossy_uint64: bool,
) -> pa.Array:
    """SingleValueData sequence -> nullable array of t."""
    if t.base == "String":
        vals: list = []
        for _ in range(rows):
            (size,) = np.frombuffer(
                _read_exact(buf, 4, "agg state String size"), dtype="<i4"
            )
            if size < 0:
                vals.append(None)
            else:
                b = _read_exact(buf, int(size), "agg state String value")
                vals.append(
                    b.decode("utf-8", "replace") if scrub_strings
                    else b.decode("utf-8")
                )
        return pa.array(vals, type=pa.string())
    width = _value_width(t)
    dense = bytearray()
    has = np.zeros(rows, dtype=bool)
    for i in range(rows):
        flag = _read_exact(buf, 1, "agg state has-flag")[0]
        if flag not in (0, 1):
            raise ValueError(
                f"agg state has-flag must be 0/1, got {flag}"
            )
        if flag:
            has[i] = True
            dense += _read_exact(buf, width, "agg state value")
    n = int(has.sum())
    present = _decode_dense(
        bytes(dense), t, n,
        scrub_strings=scrub_strings, lossy_uint64=lossy_uint64,
    )
    idx = np.zeros(rows, dtype=np.int64)
    idx[has] = np.arange(n)
    return present.take(pa.array(idx, mask=~has))


def _encode_single_values(buf: BinaryIO, t: CHType, arr: pa.Array) -> None:
    from .codec import encode_column

    if t.base == "String":
        for v in arr.to_pylist():
            if v is None:
                buf.write(np.int32(-1).tobytes())
            else:
                b = v.encode("utf-8")
                buf.write(np.int32(len(b)).tobytes())
                buf.write(b)
        return
    width = _value_width(t)
    for i in range(len(arr)):
        one = arr.slice(i, 1)
        if one.null_count:
            buf.write(b"\x00")
            continue
        buf.write(b"\x01")
        tmp = io.BytesIO()
        encode_column(tmp, t, one)
        raw = tmp.getvalue()
        if len(raw) != width:
            raise ValueError(
                f"agg single-value encode produced {len(raw)} bytes for "
                f"{t.name} (expected {width})"
            )
        buf.write(raw)


def decode_states(
    buf: BinaryIO,
    spec: AggSpec,
    rows: int,
    *,
    scrub_strings: bool = False,
    lossy_uint64: bool = False,
) -> pa.Array:
    from .codec import read_varuint

    f = spec.func
    if f == "count":
        vals = np.empty(rows, dtype=np.int64)
        for i in range(rows):
            vals[i] = read_varuint(buf)
        return pa.array(vals, type=pa.int64())
    if f == "sum":
        return _decode_dense(
            _read_exact(
                buf,
                _value_width(_widened(spec.args[0])) * rows,
                "sum states",
            ),
            _widened(spec.args[0]),
            rows,
            scrub_strings=scrub_strings,
            lossy_uint64=lossy_uint64,
        )
    if f == "sumWithOverflow" or f in _BIT_FUNCS:
        t = spec.args[0]
        return _decode_dense(
            _read_exact(buf, _value_width(t) * rows, f"{f} states"),
            t, rows,
            scrub_strings=scrub_strings, lossy_uint64=lossy_uint64,
        )
    if f == "avg":
        num_t = _widened(spec.args[0])
        width = _value_width(num_t)
        dense = bytearray()
        denom = np.empty(rows, dtype=np.int64)
        for i in range(rows):
            dense += _read_exact(buf, width, "avg numerator")
            denom[i] = read_varuint(buf)
        num = _decode_dense(
            bytes(dense), num_t, rows,
            scrub_strings=scrub_strings, lossy_uint64=lossy_uint64,
        )
        return pa.StructArray.from_arrays(
            [num, pa.array(denom, type=pa.int64())],
            ["numerator", "denominator"],
        )
    if f in _SINGLE_VALUE_FUNCS:
        return _decode_single_values(
            buf, spec.args[0], rows,
            scrub_strings=scrub_strings, lossy_uint64=lossy_uint64,
        )
    if f == "uniqExact":
        t = spec.args[0]
        width = _value_width(t)
        dense = bytearray()
        offsets = np.empty(rows + 1, dtype=np.int64)
        offsets[0] = 0
        for i in range(rows):
            n = read_varuint(buf)
            offsets[i + 1] = offsets[i] + n
            dense += _read_exact(buf, width * n, "uniqExact elements")
        flat = _decode_dense(
            bytes(dense), t, int(offsets[-1]),
            scrub_strings=scrub_strings, lossy_uint64=lossy_uint64,
        )
        # hash-dump order is arbitrary: sort each set for determinism
        items = flat.to_pylist()
        rows_out = [
            sorted(items[offsets[i]:offsets[i + 1]]) for i in range(rows)
        ]
        return pa.array(rows_out, type=pa.list_(flat.type))
    if f in ("argMin", "argMax"):
        r_vals: list[pa.Array] = []
        c_vals: list[pa.Array] = []
        for _ in range(rows):
            r_vals.append(
                _decode_single_values(
                    buf, spec.args[0], 1,
                    scrub_strings=scrub_strings, lossy_uint64=lossy_uint64,
                )
            )
            c_vals.append(
                _decode_single_values(
                    buf, spec.args[1], 1,
                    scrub_strings=scrub_strings, lossy_uint64=lossy_uint64,
                )
            )
        return pa.StructArray.from_arrays(
            [
                pa.concat_arrays(r_vals) if r_vals
                else pa.nulls(0, arrow_type(spec).field("result").type),
                pa.concat_arrays(c_vals) if c_vals
                else pa.nulls(0, arrow_type(spec).field("comparison").type),
            ],
            ["result", "comparison"],
        )
    raise UnsupportedTypeError(f"agg state decode for {f!r}")


def skip_states(buf: BinaryIO, spec: AggSpec, rows: int) -> None:
    """States are self-delimiting but not fixed-width: skipping IS
    parsing (same as the codec's varint-framed String skip)."""
    decode_states(buf, spec, rows)


def encode_states(buf: BinaryIO, spec: AggSpec, arr: pa.Array) -> None:
    """Inverse of decode_states — the writer's arm, and what the
    round-trip tests drive."""
    from .codec import encode_column, write_varuint

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    f = spec.func
    if f == "count":
        for v in arr.to_pylist():
            if v is None or v < 0:
                raise ValueError("count state must be a non-negative int")
            write_varuint(buf, int(v))
        return
    if f == "sum":
        t = _widened(spec.args[0])
        tmp = io.BytesIO()
        encode_column(tmp, t, arr)
        raw = tmp.getvalue()
        if len(raw) != _value_width(t) * len(arr):
            raise ValueError("sum states must be non-null fixed values")
        buf.write(raw)
        return
    if f == "sumWithOverflow" or f in _BIT_FUNCS:
        t = spec.args[0]
        tmp = io.BytesIO()
        encode_column(tmp, t, arr)
        raw = tmp.getvalue()
        if len(raw) != _value_width(t) * len(arr):
            raise ValueError(f"{f} states must be non-null fixed values")
        buf.write(raw)
        return
    if f == "avg":
        num_t = _widened(spec.args[0])
        width = _value_width(num_t)
        num = arr.field("numerator")
        den = arr.field("denominator").to_pylist()
        for i in range(len(arr)):
            tmp = io.BytesIO()
            encode_column(tmp, num_t, num.slice(i, 1))
            raw = tmp.getvalue()
            if len(raw) != width:
                raise ValueError("avg numerator must be non-null")
            buf.write(raw)
            d = den[i]
            if d is None or d < 0:
                raise ValueError("avg denominator must be a non-negative int")
            write_varuint(buf, int(d))
        return
    if f in _SINGLE_VALUE_FUNCS:
        _encode_single_values(buf, spec.args[0], arr)
        return
    if f == "uniqExact":
        t = spec.args[0]
        width = _value_width(t)
        for v in arr.to_pylist():
            if v is None:
                raise ValueError("uniqExact state must be a (possibly "
                                 "empty) list, not NULL")
            write_varuint(buf, len(v))
            if v:
                tmp = io.BytesIO()
                encode_column(tmp, t, pa.array(v, type=arr.type.value_type))
                raw = tmp.getvalue()
                if len(raw) != width * len(v):
                    raise ValueError(
                        "uniqExact elements must be non-null fixed values"
                    )
                buf.write(raw)
        return
    if f in ("argMin", "argMax"):
        res = arr.field("result")
        cmp = arr.field("comparison")
        for i in range(len(arr)):
            _encode_single_values(buf, spec.args[0], res.slice(i, 1))
            _encode_single_values(buf, spec.args[1], cmp.slice(i, 1))
        return
    raise UnsupportedTypeError(f"agg state encode for {f!r}")
