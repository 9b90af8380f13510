"""ClickHouse type-string parsing and Spark/Arrow type mapping.

Clean-room re-expression of the reference's type parser
(/root/reference/src/lib.rs:106-141 ``parse_column_type`` and
lib.rs:78-104 ``parse_enum_values``) extended well beyond the
reference's 5 supported types: we additionally cover the full
fixed-width integer/float family, Date/Date32/DateTime/DateTime64,
Bool, FixedString(n), Enum16, Nullable(T), Array(T) and Tuple(...).

The reference maps UInt64 -> Int32 lossily (lib.rs:336-344); we
default to Int64 and RAISE on values >= 2^63 (LongType cannot hold
them — an error beats a silent two's-complement wrap), with an opt-in
``lossy_uint64`` compat flag (see reader options) for byte-faithful
oracle diffs against the reference's truncation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa


class UnsupportedTypeError(ValueError):
    """Raised for ClickHouse types we cannot decode.

    The reference emits a literal ``<unsupported:T>`` string and then
    desynchronizes the byte stream (lib.rs:168-170) — that is a bug,
    not semantics, so we fail loudly instead.
    """


@dataclass
class CHType:
    """A parsed ClickHouse type expression."""

    base: str
    params: Optional[str] = None  # raw text inside the outer parens
    inner: Optional["CHType"] = None  # for Nullable/Array/LowCardinality
    tuple_items: list["CHType"] = field(default_factory=list)
    enum_map: dict[int, str] = field(default_factory=dict)  # Enum8/16
    fixed_len: int = 0  # FixedString(n)
    scale: int = 0  # DateTime64 precision
    nullable: bool = False
    tuple_names: list[str] = field(default_factory=list)  # Nested field names
    # original ClickHouse spelling when the type is an alias for a
    # structural layout (geo types: 'Point' IS Tuple(Float64, Float64)
    # on the wire) — keeps headers/DESCRIBE rendering the alias
    display: Optional[str] = None
    # parsed aggstate.AggSpec for decodable AggregateFunction(f, T...)
    agg: Optional[object] = None

    @property
    def name(self) -> str:
        if self.display is not None:
            return self.display
        if self.base in ("LowCardinality", "Array") and self.inner is not None:
            inner = self.inner.name
            if self.inner.nullable:
                inner = f"Nullable({inner})"
            return f"{self.base}({inner})"
        if self.params is not None:
            return f"{self.base}({self.params})"
        return self.base


# fixed-width physical layouts: base -> (numpy dtype string, byte width)
FIXED_WIDTH: dict[str, tuple[str, int]] = {
    "UInt8": ("<u1", 1),
    "UInt16": ("<u2", 2),
    "UInt32": ("<u4", 4),
    "UInt64": ("<u8", 8),
    "Int8": ("<i1", 1),
    "Int16": ("<i2", 2),
    "Int32": ("<i4", 4),
    "Int64": ("<i8", 8),
    "Float32": ("<f4", 4),
    "Float64": ("<f8", 8),
    "Bool": ("<u1", 1),
    "Date": ("<u2", 2),  # days since 1970-01-01
    "Date32": ("<i4", 4),  # days since 1970-01-01 (signed)
    "DateTime": ("<u4", 4),  # seconds since epoch
    "DateTime64": ("<i8", 8),  # ticks at 10^-scale seconds
    "Enum8": ("<i1", 1),
    "Enum16": ("<i2", 2),
}

# big-int family: byte width of the little-endian two's-complement
# wire layout.  Carried as Arrow decimal128(38, 0): values with more
# than 38 significant digits RAISE on decode (the lossless carrier
# does not exist in Spark — an error beats a silent wrap, the same
# policy as UInt64 >= 2^63).
BIG_INT_WIDTH: dict[str, int] = {
    "Int128": 16,
    "UInt128": 16,
    "Int256": 32,
    "UInt256": 32,
}

# geo-type aliases -> the structural spelling with the SAME wire bytes
_GEO_TYPE_EQUIV: dict[str, str] = {
    "Point": "Tuple(Float64, Float64)",
    "Ring": "Array(Point)",
    "LineString": "Array(Point)",
    "MultiLineString": "Array(LineString)",
    "Polygon": "Array(Ring)",
    "MultiPolygon": "Array(Polygon)",
}

_ENUM_ITEM = re.compile(r"'((?:[^'\\]|\\.)*)'\s*=\s*(-?\d+)")


def parse_enum_values(params: str) -> dict[int, str]:
    """Parse ``'a' = 1, 'b' = 2`` into {1: 'a', 2: 'b'}.

    Mirrors the reference's parse_enum_values (lib.rs:78-104) but
    handles escaped quotes inside labels.
    """
    out: dict[int, str] = {}
    for m in _ENUM_ITEM.finditer(params):
        label = m.group(1).replace("\\'", "'").replace("\\\\", "\\")
        out[int(m.group(2))] = label
    return out


def _split_top_level(params: str) -> list[str]:
    """Split a parameter list on commas at paren/quote depth zero."""
    parts: list[str] = []
    depth = 0
    in_str = False
    cur: list[str] = []
    i = 0
    while i < len(params):
        c = params[i]
        if in_str:
            cur.append(c)
            if c == "\\" and i + 1 < len(params):
                cur.append(params[i + 1])
                i += 1
            elif c == "'":
                in_str = False
        elif c == "'":
            in_str = True
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return parts


def parse_type(type_str: str, *, unsupported_as_varchar: bool = False) -> CHType:
    """Parse a ClickHouse type string into a CHType tree.

    Like the reference (lib.rs:106-141): split ``Base(params)`` at the
    first ``(`` then dispatch on the base name — but recursive for
    wrapper types. ``unsupported_as_varchar=True`` reproduces the
    reference's placeholder behavior for unknown types (see below);
    the default raises ``UnsupportedTypeError``.
    """
    s = type_str.strip()
    if "(" in s and s.endswith(")"):
        base = s[: s.index("(")].strip()
        params = s[s.index("(") + 1 : -1]
    else:
        base, params = s, None

    t = CHType(base=base, params=params)

    if base in ("Nullable", "LowCardinality"):
        if params is None:
            raise UnsupportedTypeError(f"{base} needs a parameter: {type_str!r}")
        inner = parse_type(params)
        if base == "Nullable":
            if inner.base in ("Variant", "Dynamic"):
                # invalid in ClickHouse (NULL is the Variant/Dynamic
                # 255 discriminator); accepting it would read a bogus
                # null mask and desync the stream
                raise UnsupportedTypeError(
                    f"Nullable({inner.base}(...)) is not a valid "
                    f"ClickHouse type — {inner.base} already carries "
                    f"NULL: {type_str!r}"
                )
            if inner.base == "AggregateFunction":
                # invalid in ClickHouse: states are never NULL (an
                # empty group simply has no row)
                raise UnsupportedTypeError(
                    "Nullable(AggregateFunction(...)) is not a valid "
                    f"ClickHouse type: {type_str!r}"
                )
            inner.nullable = True
            inner.params = None if inner.params is None else inner.params
            return inner
        # LowCardinality(T) uses a dictionary-encoded wire layout we
        # decode separately; keep the wrapper.
        t.inner = inner
        return t
    if base == "Array":
        if params is None:
            raise UnsupportedTypeError(f"Array needs a parameter: {type_str!r}")
        t.inner = parse_type(params)
        return t
    if base == "Map":
        # wire layout is Array(Tuple(K, V)): offsets, then the key and
        # value payloads (public ClickHouse serialization)
        if params is None:
            raise UnsupportedTypeError(f"Map needs parameters: {type_str!r}")
        kv = _split_top_level(params)
        if len(kv) != 2:
            raise UnsupportedTypeError(f"Map needs exactly K, V: {type_str!r}")
        t.tuple_items = [parse_type(kv[0]), parse_type(kv[1])]
        return t
    if base == "Tuple":
        if params is None:
            raise UnsupportedTypeError(f"Tuple needs parameters: {type_str!r}")
        for item in _split_top_level(params):
            # named tuple elements: "name Type"
            piece = item.strip()
            sp = piece.find(" ")
            if sp > 0 and "(" not in piece[:sp] and "'" not in piece[:sp]:
                maybe_type = piece[sp + 1 :].strip()
                try:
                    t.tuple_items.append(parse_type(maybe_type))
                    continue
                except UnsupportedTypeError:
                    pass
            t.tuple_items.append(parse_type(piece))
        return t
    if base == "Nested":
        # Nested(a T1, b T2): a real server FLATTENS this to sibling
        # `n.a Array(T1)` / `n.b Array(T2)` columns in Native blocks
        # (docs: data-types/nested-data-structures); when the declared
        # type itself appears (DESCRIBE output, our own files) the
        # layout is the equivalent Array(Tuple(...)) and the Arrow
        # carrier keeps the field NAMES so `col.field` projection works.
        if params is None:
            raise UnsupportedTypeError(f"Nested needs parameters: {type_str!r}")
        for item in _split_top_level(params):
            piece = item.strip()
            sp = piece.find(" ")
            if sp <= 0:
                raise UnsupportedTypeError(
                    f"Nested items need 'name Type': {type_str!r}"
                )
            t.tuple_names.append(piece[:sp])
            t.tuple_items.append(parse_type(piece[sp + 1 :].strip()))
        return t
    if base in _GEO_TYPE_EQUIV and params is None:
        # geo types (docs: sql-reference/data-types/geo) are ALIASES
        # for nested Array/Tuple layouts — identical Native wire bytes
        # (Point = Tuple(Float64, Float64), Ring/LineString =
        # Array(Point), Polygon = Array(Ring), MultiPolygon =
        # Array(Polygon)); the codec already decodes those, so only the
        # NAME mapping lives here (ref analogue: the type dispatch at
        # lib.rs:106-141, whose unsupported arm geo tables used to hit).
        g = parse_type(_GEO_TYPE_EQUIV[base])
        g.display = base
        return g
    if base == "AggregateFunction":
        # AggregatingMergeTree state columns.  The COMMON function
        # family (count/sum/avg/min/max/any/anyLast/uniqExact/
        # groupBit*/argMin/argMax) decodes via the clean-room state
        # codec (native/aggstate.py — layouts re-expressed from
        # ClickHouse's public serialize() implementations; the
        # reference itself refuses these columns at lib.rs:168-170).
        # Anything outside that family — parametrized functions,
        # combinators, sketch states like uniq — refuses loudly BY
        # NAME: those layouts are version-dependent sketch internals.
        # In reference-compat placeholder mode the column placeholders
        # like any unknown type (same desync-unless-last caveat).
        if params is not None:
            from .aggstate import parse_agg_spec

            try:
                t.agg = parse_agg_spec(params)
                return t
            except UnsupportedTypeError as e:
                if unsupported_as_varchar:
                    pass  # fall through to the placeholder arm below
                else:
                    raise UnsupportedTypeError(
                        f"AggregateFunction state column {type_str!r} "
                        f"cannot be decoded: {e}. Re-aggregate from raw "
                        "data, or use the engine's partial-state merge "
                        "operators (agg_state_merge, projections)."
                    )
        elif not unsupported_as_varchar:
            raise UnsupportedTypeError(
                f"AggregateFunction needs (function, types...): "
                f"{type_str!r}"
            )
    if base == "SimpleAggregateFunction":
        # SimpleAggregateFunction(f, T) stores PLAIN values of T — the
        # wire layout is exactly T (docs: data-types/
        # simpleaggregatefunction), so decode as the inner type.
        if params is None:
            raise UnsupportedTypeError(
                f"SimpleAggregateFunction needs parameters: {type_str!r}"
            )
        parts = _split_top_level(params)
        if len(parts) < 2:
            raise UnsupportedTypeError(
                f"SimpleAggregateFunction needs (f, T): {type_str!r}"
            )
        return parse_type(", ".join(parts[1:]))
    if base == "Variant":
        # Variant(T1, ..., Tn) — one value of exactly one variant per
        # row, NULL allowed (docs: sql-reference/data-types/variant).
        # ClickHouse canonicalizes the variant ORDER by sorting type
        # names (Variant(String, UInt64) == Variant(UInt64, String));
        # discriminators refer to the sorted order.  Nullable inside a
        # Variant is invalid (NULL is discriminator 255).
        if params is None:
            raise UnsupportedTypeError(f"Variant needs parameters: {type_str!r}")
        items = [parse_type(p) for p in _split_top_level(params)]
        for it in items:
            if it.nullable:
                raise UnsupportedTypeError(
                    f"Variant cannot contain Nullable types (NULL is the "
                    f"255 discriminator): {type_str!r}"
                )
        items.sort(key=lambda it: it.name)
        t.tuple_items = items
        t.params = ", ".join(it.name for it in items)
        return t
    if base == "Dynamic":
        # Dynamic [(max_types=N)] — the self-describing any-type column
        # (docs: sql-reference/data-types/dynamic, 24.5+).  The variant
        # set lives in a VERSIONED DATA PREFIX, not the type string, so
        # a header-only bind cannot know the member types; the stable
        # Spark mapping is therefore TYPE-ERASED:
        # struct<type: string, value: string> (type = the ClickHouse
        # type name of the row's value, value = its canonical text).
        # Typed access is `CAST(d.value AS T) WHERE d.type = 'T'` —
        # the engine-side analogue of ClickHouse's dynamicElement /
        # `d.Int64` subcolumn reads.  The wire body rides the r14
        # Variant machinery (codec.py decode/skip/encode arms).
        mt = 32  # ClickHouse default max_dynamic_types
        if params is not None:
            m = re.fullmatch(r"\s*max_types\s*=\s*(\d+)\s*", params)
            if m is None:
                raise UnsupportedTypeError(
                    f"Dynamic parameters must be max_types=N: {type_str!r}"
                )
            mt = int(m.group(1))
            if not 0 < mt <= 255:
                raise UnsupportedTypeError(
                    f"Dynamic max_types must be in 1..255: {type_str!r}"
                )
        t.fixed_len = mt
        return t
    if base == "Object":
        # Object('json') — the pre-24.x spelling of the JSON type
        if params is None or params.strip().strip("'").lower() != "json":
            raise UnsupportedTypeError(f"unsupported Object type: {type_str!r}")
        return CHType("JSON")
    if base in ("Enum8", "Enum16"):
        if params:
            t.enum_map = parse_enum_values(params)
        return t
    if base == "FixedString":
        if params is None:
            raise UnsupportedTypeError(f"FixedString needs a length: {type_str!r}")
        t.fixed_len = int(params)
        return t
    if base == "DateTime64":
        if params:
            parts = _split_top_level(params)
            t.scale = int(parts[0])
        else:
            t.scale = 3
        return t
    if base == "DateTime" and params:
        # DateTime('UTC') — timezone is display metadata; storage is
        # epoch seconds regardless.
        return t
    if base == "Decimal" and params:
        # Decimal(P, S)
        parts = _split_top_level(params)
        t.scale = int(parts[1]) if len(parts) > 1 else 0
        t.fixed_len = int(parts[0])
        return t
    if base in ("Decimal32", "Decimal64", "Decimal128") and params:
        t.scale = int(params)
        t.fixed_len = {"Decimal32": 9, "Decimal64": 18, "Decimal128": 38}[base]
        return t
    if (
        base in FIXED_WIDTH
        or base in BIG_INT_WIDTH
        or base in ("String", "UUID", "IPv4", "IPv6", "JSON")
    ):
        return t
    if unsupported_as_varchar:
        # reference-compat mode (lib.rs:168-170): represent the column
        # as a '<unsupported:T>' varchar placeholder instead of raising.
        # Like the reference, this does NOT consume the column's payload
        # bytes (their length is unknowable for an unknown type), so the
        # stream desynchronizes unless the column is last — which is why
        # raising remains the default.
        return CHType("Unsupported", params=type_str)
    raise UnsupportedTypeError(f"unsupported ClickHouse type: {type_str!r}")


def to_arrow(t: CHType, *, lossy_uint64: bool = False) -> pa.DataType:
    """Map a parsed CH type to the Arrow type our reader emits.

    Reference mapping (lib.rs:253-261 / clickhouse_scan.rs:31-45) is
    lossy for UInt64; ours is lossless by default.
    """
    b = t.base
    if b == "Unsupported":
        return pa.string()  # '<unsupported:T>' placeholder (lib.rs:168-170)
    if b in ("String", "FixedString", "UUID", "IPv4", "IPv6", "JSON"):
        return pa.string()
    if b in BIG_INT_WIDTH:
        return pa.decimal128(38, 0)
    if b == "Nested":
        return pa.list_(
            pa.struct(
                [
                    pa.field(n, to_arrow(it, lossy_uint64=lossy_uint64))
                    for n, it in zip(t.tuple_names, t.tuple_items)
                ]
            )
        )
    if b in ("Enum8", "Enum16"):
        return pa.string()  # decoded labels, like the reference (lib.rs:157-166)
    if b == "UInt8":
        return pa.int32() if lossy_uint64 else pa.int16()
    if b == "UInt16":
        return pa.int32()
    if b == "UInt32":
        return pa.int64()
    if b == "UInt64":
        return pa.int32() if lossy_uint64 else pa.int64()
    if b == "Int8":
        return pa.int8()
    if b == "Int16":
        return pa.int16()
    if b == "Int32":
        return pa.int32()
    if b == "Int64":
        return pa.int64()
    if b == "Float32":
        return pa.float32()
    if b == "Float64":
        return pa.float64()
    if b == "Bool":
        return pa.bool_()
    if b in ("Date", "Date32"):
        return pa.date32()
    if b == "DateTime":
        return pa.timestamp("us")
    if b == "DateTime64":
        return pa.timestamp("us")
    if b in ("Decimal", "Decimal32", "Decimal64", "Decimal128"):
        return pa.decimal128(t.fixed_len, t.scale)
    if b == "Array":
        assert t.inner is not None
        return pa.list_(to_arrow(t.inner, lossy_uint64=lossy_uint64))
    if b == "Tuple":
        return pa.struct(
            [
                pa.field(f"_{i+1}", to_arrow(it, lossy_uint64=lossy_uint64))
                for i, it in enumerate(t.tuple_items)
            ]
        )
    if b == "Variant":
        # one nullable field PER VARIANT, named by the ClickHouse type
        # name — mirrors ClickHouse's subcolumn access (`v.String`,
        # `v.UInt64`): exactly one field non-null per row, all null for
        # a NULL row
        return pa.struct(
            [
                pa.field(it.name, to_arrow(it, lossy_uint64=lossy_uint64))
                for it in t.tuple_items
            ]
        )
    if b == "Dynamic":
        # type-erased stable mapping (the variant set is a per-column
        # DATA prefix, unknowable at header-only bind — see parse_type)
        return pa.struct(
            [pa.field("type", pa.string()), pa.field("value", pa.string())]
        )
    if b == "AggregateFunction":
        from .aggstate import arrow_type as _agg_arrow

        assert t.agg is not None
        return _agg_arrow(t.agg, lossy_uint64=lossy_uint64)
    if b == "LowCardinality":
        assert t.inner is not None
        return to_arrow(t.inner, lossy_uint64=lossy_uint64)
    if b == "Map":
        return pa.map_(
            to_arrow(t.tuple_items[0], lossy_uint64=lossy_uint64),
            to_arrow(t.tuple_items[1], lossy_uint64=lossy_uint64),
        )
    raise UnsupportedTypeError(f"no arrow mapping for {t.name}")


def from_arrow(dt: pa.DataType) -> CHType:
    """Inverse map for the writer: Arrow/Spark type -> CH type."""
    if pa.types.is_dictionary(dt):
        t = CHType("LowCardinality")
        t.inner = from_arrow(dt.value_type)
        return t
    if pa.types.is_string(dt) or pa.types.is_large_string(dt):
        return CHType("String")
    if pa.types.is_boolean(dt):
        return CHType("Bool")
    if pa.types.is_int8(dt):
        return CHType("Int8")
    if pa.types.is_int16(dt):
        return CHType("Int16")
    if pa.types.is_int32(dt):
        return CHType("Int32")
    if pa.types.is_int64(dt):
        return CHType("Int64")
    if pa.types.is_uint8(dt):
        return CHType("UInt8")
    if pa.types.is_uint16(dt):
        return CHType("UInt16")
    if pa.types.is_uint32(dt):
        return CHType("UInt32")
    if pa.types.is_uint64(dt):
        return CHType("UInt64")
    if pa.types.is_float32(dt):
        return CHType("Float32")
    if pa.types.is_float64(dt):
        return CHType("Float64")
    if pa.types.is_date32(dt):
        return CHType("Date32")
    if pa.types.is_timestamp(dt):
        # preserve source precision: ns data (e.g. parquet ns columns)
        # must not be truncated on write
        scale = {"s": 0, "ms": 3, "us": 6, "ns": 9}[dt.unit]
        t = CHType("DateTime64", params=str(scale))
        t.scale = scale
        return t
    if pa.types.is_decimal(dt):
        t = CHType("Decimal", params=f"{dt.precision}, {dt.scale}")
        t.fixed_len = dt.precision
        t.scale = dt.scale
        return t
    if pa.types.is_map(dt):
        t = CHType("Map")
        t.tuple_items = [from_arrow(dt.key_type), from_arrow(dt.item_type)]
        t.params = f"{t.tuple_items[0].name}, {t.tuple_items[1].name}"
        return t
    if pa.types.is_list(dt) or pa.types.is_large_list(dt):
        t = CHType("Array")
        t.inner = from_arrow(dt.value_type)
        t.params = t.inner.name
        return t
    if pa.types.is_struct(dt):
        t = CHType("Tuple")
        t.tuple_items = [from_arrow(dt.field(i).type) for i in range(dt.num_fields)]
        t.params = ", ".join(it.name for it in t.tuple_items)
        return t
    if pa.types.is_binary(dt) or pa.types.is_large_binary(dt):
        return CHType("String")
    raise UnsupportedTypeError(f"cannot write arrow type {dt}")
