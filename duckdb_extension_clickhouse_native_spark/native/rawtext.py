"""Raw-text and whole-document JSON input formats.

ClickHouse's interchange surface has a family of formats whose "schema"
is either fixed by the format itself or carried as in-band JSON rather
than a typed header (docs: interfaces/formats):

* ``LineAsString`` — every input LINE is one row of a single String
  column named ``line`` (the schema-inference name ClickHouse uses).
  The workhorse of text/LLM pipelines: raw corpora land as lines.
* ``JSONAsString`` — every top-level JSON OBJECT is one row of a
  single String column named ``json`` holding the object's RAW text
  (not parsed into columns); a top-level JSON array of objects is
  unwrapped.  Lets malformed-tolerant pipelines defer parsing to SQL
  (``JSONExtract*`` over the column).
* ``RawBLOB`` — the ENTIRE stream is one row of a single String
  column named ``raw_blob``.
* ``JSON`` — the full result-object format
  ``{"meta": [{name, type}...], "data": [{...}...]}``: self-describing
  with REAL ClickHouse type names, so it decodes with full typing and
  needs no structure.
* ``JSONColumns`` — ``{"col": [v, ...], ...}`` (names in-band, no
  types: structure matched BY NAME, or ClickHouse-style inference).
* ``JSONCompactColumns`` — ``[[v, ...], ...]`` (nothing in-band:
  structure matched POSITIONALLY, or inference with generated names
  ``c1..cN`` — ClickHouse's convention for this format).
* ``JSONObjectEachRow`` — ``{"key": {...}, "key2": {...}}``: each
  member value is a row object; names in-band via the row objects'
  keys (structure by name, or inference).
* ``Regexp`` — each line matched against ``format_regexp``; capture
  group i feeds column i of the REQUIRED structure.  Only the ``Raw``
  escaping rule is supported (values taken as-is through the same
  text-value parser the TSV reader uses); ``format_regexp_skip_
  unmatched`` controls whether a non-matching line errors or drops.

The whole-document formats (JSON, JSONColumns, JSONCompactColumns,
JSONObjectEachRow, RawBLOB) parse ONE document per stream, so they
materialize that stream in memory — fine at their intended sizes
(query results, API payloads); the at-scale path for bulk data remains
the streaming row/columnar formats (Native, CSV/TSV, JSONEachRow…),
and parallelism across MANY documents comes from the url()/file()
one-element-one-partition planning, unchanged.

Reference surface: the reference reads FORMAT Native only
(clickhouse_scan.rs:131); this module is beyond-reference interop.
"""

from __future__ import annotations

import json
from typing import BinaryIO, Iterator, List, Optional, Tuple

import pyarrow as pa

from .codec import Block, BlockColumn
from .jsoneachrow import (
    _check_supported,
    _from_json,
    infer_json_type,
    iter_jsonobjects_blocks,
)
from .types import CHType, parse_type, to_arrow

_BLOCK_ROWS = 65_536


def _single_string_block(name: str, vals: list) -> Block:
    t = parse_type("String")
    return Block(
        n_rows=len(vals),
        columns=[
            BlockColumn(name, t.name, t, pa.array(vals, type=pa.string()))
        ],
    )


def _single_column_name(
    fmt: str,
    default: str,
    names_types: Optional[List[Tuple[str, CHType]]],
) -> str:
    """These formats have exactly ONE String column; a declared
    structure may RENAME it (ClickHouse allows file(p, LineAsString,
    'text String')) but not retype or widen it."""
    if names_types is None:
        return default
    if len(names_types) != 1:
        raise ValueError(
            f"{fmt} has exactly one column; structure declares "
            f"{len(names_types)}"
        )
    nm, t = names_types[0]
    if t.base != "String" or t.nullable:
        raise ValueError(
            f"{fmt}'s single column is String; structure declares "
            f"{t.name}"
        )
    return nm


def iter_lineasstring_blocks(
    buf: BinaryIO,
    names_types: Optional[List[Tuple[str, CHType]]] = None,
    *,
    lossy_uint64: bool = False,
    block_rows: int = _BLOCK_ROWS,
) -> Iterator[Block]:
    """``FORMAT LineAsString``: one row per line, column ``line``."""
    name = _single_column_name("LineAsString", "line", names_types)
    while True:
        vals: list = []
        while len(vals) < block_rows:
            line = buf.readline()
            if not line:
                break
            vals.append(
                line.rstrip(b"\n").rstrip(b"\r").decode("utf-8", "replace")
            )
        if not vals:
            return
        yield _single_string_block(name, vals)


def _iter_top_level_json_texts(buf: BinaryIO) -> Iterator[str]:
    """Split a byte stream into the raw texts of its top-level JSON
    objects (depth tracking, string/escape aware).  A stream that IS a
    top-level array of objects is unwrapped (ClickHouse JSONAsString
    behavior); scalars/arrays at top level refuse."""
    data = buf.read().decode("utf-8", "replace")
    i, n = 0, len(data)
    # skip whitespace; detect the array wrapper
    while i < n and data[i] in " \t\r\n":
        i += 1
    in_array = i < n and data[i] == "["
    if in_array:
        i += 1
    while True:
        while i < n and data[i] in " \t\r\n,":
            i += 1
        if i >= n:
            return
        if in_array and data[i] == "]":
            return
        if data[i] != "{":
            raise ValueError(
                "JSONAsString expects top-level JSON objects (or one "
                f"array of objects); found {data[i]!r} at offset {i}"
            )
        start = i
        depth = 0
        in_str = False
        esc = False
        while i < n:
            c = data[i]
            if in_str:
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            i += 1
        if depth != 0:
            raise EOFError("EOF inside a JSONAsString object")
        yield data[start:i]


def iter_jsonasstring_blocks(
    buf: BinaryIO,
    names_types: Optional[List[Tuple[str, CHType]]] = None,
    *,
    lossy_uint64: bool = False,
    block_rows: int = _BLOCK_ROWS,
) -> Iterator[Block]:
    """``FORMAT JSONAsString``: one row per top-level object, column
    ``json`` holding the raw object text."""
    name = _single_column_name("JSONAsString", "json", names_types)
    vals: list = []
    for text in _iter_top_level_json_texts(buf):
        vals.append(text)
        if len(vals) >= block_rows:
            yield _single_string_block(name, vals)
            vals = []
    if vals:
        yield _single_string_block(name, vals)


def iter_rawblob_blocks(
    buf: BinaryIO,
    names_types: Optional[List[Tuple[str, CHType]]] = None,
    *,
    lossy_uint64: bool = False,
    block_rows: int = _BLOCK_ROWS,
) -> Iterator[Block]:
    """``FORMAT RawBLOB``: the whole stream, one row, column
    ``raw_blob`` (non-UTF-8 bytes surface as U+FFFD — the engine's
    String carrier is utf-8; true binary belongs in Native)."""
    name = _single_column_name("RawBLOB", "raw_blob", names_types)
    data = buf.read()
    yield _single_string_block(name, [data.decode("utf-8", "replace")])


def _rows_to_blocks(
    schema: List[Tuple[str, CHType]],
    rows_vals: list,
    *,
    lossy_uint64: bool,
    block_rows: int,
) -> Iterator[Block]:
    """Emit Blocks from per-ROW python value lists (already JSON-parsed,
    positionally aligned with ``schema``)."""
    for t_i in schema:
        _check_supported(t_i[1])
    for start in range(0, len(rows_vals), block_rows) or [0]:
        piece = rows_vals[start : start + block_rows]
        if not piece and start > 0:
            break
        cols = [
            BlockColumn(
                name,
                t.name,
                t,
                pa.array(
                    [_from_json(r[i], t) for r in piece],
                    type=to_arrow(t, lossy_uint64=lossy_uint64),
                ),
            )
            for i, (name, t) in enumerate(schema)
        ]
        yield Block(n_rows=len(piece), columns=cols)
        if start + block_rows >= len(rows_vals):
            return


def iter_json_blocks(
    buf: BinaryIO,
    *,
    lossy_uint64: bool = False,
    block_rows: int = _BLOCK_ROWS,
) -> Iterator[Block]:
    """``FORMAT JSON`` (the full result object): meta carries REAL
    ClickHouse type names, so this is self-describing — data rows are
    objects keyed by column name."""
    doc = json.loads(buf.read().decode("utf-8"))
    if not isinstance(doc, dict) or "meta" not in doc or "data" not in doc:
        raise ValueError(
            "FORMAT JSON expects an object with 'meta' and 'data' keys"
        )
    schema = []
    for m in doc["meta"]:
        schema.append((m["name"], parse_type(m["type"])))
    rows = doc["data"]
    row_lists = []
    for r in rows:
        if not isinstance(r, dict):
            raise ValueError("FORMAT JSON data rows must be objects")
        row_lists.append([r.get(name) for name, _t in schema])
    yield from _rows_to_blocks(
        schema, row_lists, lossy_uint64=lossy_uint64, block_rows=block_rows
    )


def _columns_to_blocks(
    schema: List[Tuple[str, CHType]],
    col_lists: list,
    *,
    lossy_uint64: bool,
    block_rows: int,
) -> Iterator[Block]:
    lens = {len(c) for c in col_lists}
    if len(lens) > 1:
        raise ValueError(
            f"columnar JSON: columns have differing lengths {sorted(lens)}"
        )
    n = len(col_lists[0]) if col_lists else 0
    for t_i in schema:
        _check_supported(t_i[1])
    start = 0
    while True:
        end = min(n, start + block_rows)
        cols = [
            BlockColumn(
                name,
                t.name,
                t,
                pa.array(
                    [_from_json(v, t) for v in col_lists[i][start:end]],
                    type=to_arrow(t, lossy_uint64=lossy_uint64),
                ),
            )
            for i, (name, t) in enumerate(schema)
        ]
        yield Block(n_rows=end - start, columns=cols)
        start = end
        if start >= n:
            return


def iter_jsoncolumns_blocks(
    buf: BinaryIO,
    names_types: Optional[List[Tuple[str, CHType]]] = None,
    *,
    lossy_uint64: bool = False,
    block_rows: int = _BLOCK_ROWS,
) -> Iterator[Block]:
    """``FORMAT JSONColumns``: one object, column name -> value array.
    Names are in-band; types by-name from the structure or inferred."""
    doc = json.loads(buf.read().decode("utf-8"))
    if not isinstance(doc, dict):
        raise ValueError("JSONColumns expects a top-level object")
    names = list(doc.keys())
    if names_types is not None:
        by_name = dict(names_types)
        missing = [nm for nm in names if nm not in by_name]
        if missing:
            raise ValueError(
                f"JSONColumns: stream columns {missing} are not in the "
                f"declared structure ({sorted(by_name)})"
            )
        schema = [(nm, by_name[nm]) for nm in names]
    else:
        schema = [
            (nm, infer_json_type(doc[nm], "JSONColumns")) for nm in names
        ]
    yield from _columns_to_blocks(
        schema,
        [doc[nm] for nm in names],
        lossy_uint64=lossy_uint64,
        block_rows=block_rows,
    )


def iter_jsoncompactcolumns_blocks(
    buf: BinaryIO,
    names_types: Optional[List[Tuple[str, CHType]]] = None,
    *,
    lossy_uint64: bool = False,
    block_rows: int = _BLOCK_ROWS,
) -> Iterator[Block]:
    """``FORMAT JSONCompactColumns``: an array of value arrays.  No
    names in-band: structure applies POSITIONALLY; inference uses
    ClickHouse's generated ``c1..cN`` names."""
    doc = json.loads(buf.read().decode("utf-8"))
    if not isinstance(doc, list) or not all(
        isinstance(c, list) for c in doc
    ):
        raise ValueError(
            "JSONCompactColumns expects a top-level array of arrays"
        )
    if names_types is not None:
        if len(names_types) != len(doc):
            raise ValueError(
                f"JSONCompactColumns: stream has {len(doc)} columns, "
                f"structure declares {len(names_types)}"
            )
        schema = list(names_types)
    else:
        schema = [
            (f"c{i + 1}", infer_json_type(col, "JSONCompactColumns"))
            for i, col in enumerate(doc)
        ]
    yield from _columns_to_blocks(
        schema, doc, lossy_uint64=lossy_uint64, block_rows=block_rows
    )


def iter_jsonobjecteachrow_blocks(
    buf: BinaryIO,
    names_types: Optional[List[Tuple[str, CHType]]] = None,
    *,
    lossy_uint64: bool = False,
    block_rows: int = _BLOCK_ROWS,
) -> Iterator[Block]:
    """``FORMAT JSONObjectEachRow``: one object whose member VALUES are
    the row objects (member keys are row labels, dropped — ClickHouse
    surfaces them only via format_json_object_each_row_column_for_
    object_name, not by default)."""
    doc = json.loads(buf.read().decode("utf-8"))
    if not isinstance(doc, dict) or not all(
        isinstance(v, dict) for v in doc.values()
    ):
        raise ValueError(
            "JSONObjectEachRow expects a top-level object of row objects"
        )
    rows = list(doc.values())
    if names_types is not None:
        schema = list(names_types)
    else:
        names: list = []
        for r in rows[: min(len(rows), 25_000)]:
            for k in r:
                if k not in names:
                    names.append(k)
        schema = [
            (
                nm,
                infer_json_type(
                    [r.get(nm) for r in rows[:25_000]], "JSONObjectEachRow"
                ),
            )
            for nm in names
        ]
    row_lists = [[r.get(nm) for nm, _t in schema] for r in rows]
    yield from _rows_to_blocks(
        schema, row_lists, lossy_uint64=lossy_uint64, block_rows=block_rows
    )


def iter_jsoneachrow_infer_blocks(
    buf: BinaryIO,
    names_types: Optional[List[Tuple[str, CHType]]] = None,
    *,
    lossy_uint64: bool = False,
    block_rows: int = _BLOCK_ROWS,
    infer_rows: int = 25_000,
) -> Iterator[Block]:
    """``FORMAT JSONEachRow`` with optional structure: WITH one, the
    streaming decoder (jsoneachrow.iter_jsonobjects_blocks) runs
    unchanged; WITHOUT one, names come from the objects' keys
    (first-appearance order) and types from ClickHouse-style inference
    over the first ``infer_rows`` rows — matching ClickHouse, which
    schema-infers this format (NDJSON/JSONLines are aliases)."""
    if names_types is not None:
        yield from iter_jsonobjects_blocks(
            buf, names_types, lossy_uint64=lossy_uint64, block_rows=block_rows
        )
        return
    prefix_objs: list = []
    names: list = []
    while len(prefix_objs) < infer_rows:
        line = buf.readline()
        if not line:
            break
        if not line.strip():
            continue
        obj = json.loads(line)
        if not isinstance(obj, dict):
            raise ValueError(
                f"JSONEachRow line is not a JSON object "
                f"(got {type(obj).__name__})"
            )
        prefix_objs.append(obj)
        for k in obj:
            if k not in names:
                names.append(k)
    if not prefix_objs:
        return
    schema = [
        (
            nm,
            infer_json_type(
                [o.get(nm) for o in prefix_objs], "JSONEachRow"
            ),
        )
        for nm in names
    ]
    # emit the inspected prefix, then stream the remainder through the
    # existing decoder (same schema)
    row_lists = [[o.get(nm) for nm, _t in schema] for o in prefix_objs]
    yield from _rows_to_blocks(
        schema, row_lists, lossy_uint64=lossy_uint64, block_rows=block_rows
    )
    yield from iter_jsonobjects_blocks(
        buf, schema, lossy_uint64=lossy_uint64, block_rows=block_rows
    )


def iter_regexp_blocks(
    buf: BinaryIO,
    names_types: List[Tuple[str, CHType]],
    regexp: str,
    *,
    skip_unmatched: bool = False,
    lossy_uint64: bool = False,
    block_rows: int = _BLOCK_ROWS,
) -> Iterator[Block]:
    """``FORMAT Regexp``: every line matched against ``regexp``;
    capture group i feeds structure column i (Raw escaping rule —
    values parse through the same text parser the TSV reader uses)."""
    import re

    from .textformats import _from_text

    pat = re.compile(regexp)
    if pat.groups != len(names_types):
        raise ValueError(
            f"format_regexp has {pat.groups} capture groups but the "
            f"structure declares {len(names_types)} columns"
        )
    for _nm, t in names_types:
        _check_supported(t)
    lineno = 0
    while True:
        cols_vals: list = [[] for _ in names_types]
        n = 0
        while n < block_rows:
            line = buf.readline()
            if not line:
                break
            lineno += 1
            s = line.rstrip(b"\n").rstrip(b"\r").decode("utf-8", "replace")
            if not s:
                continue
            m = pat.fullmatch(s)
            if m is None:
                if skip_unmatched:
                    continue
                raise ValueError(
                    f"Regexp format: line {lineno} does not match "
                    f"format_regexp (set format_regexp_skip_unmatched "
                    f"to drop): {s[:120]!r}"
                )
            for i, (_nm, t) in enumerate(names_types):
                g = m.group(i + 1)
                cols_vals[i].append(
                    None if g is None else _from_text(g, t)
                )
            n += 1
        if n == 0:
            return
        cols = [
            BlockColumn(
                nm,
                t.name,
                t,
                pa.array(
                    cols_vals[i], type=to_arrow(t, lossy_uint64=lossy_uint64)
                ),
            )
            for i, (nm, t) in enumerate(names_types)
        ]
        yield Block(n_rows=n, columns=cols)
