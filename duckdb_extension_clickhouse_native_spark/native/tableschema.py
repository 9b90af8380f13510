"""Metadata-only schema evolution — the ClickHouse ``ALTER TABLE ...
ADD/DROP/RENAME COLUMN`` analogue (reference surface: the host
engine's ALTER path; the reference repo reads files, lib.rs:240-366,
and never mutates).

ClickHouse ALTERs of this class are METADATA operations: no part is
rewritten.  Parts written before an ADD materialize the default at
read time; a DROP merely hides the column (its payload bytes are
skipped, never decoded); a RENAME maps the new name onto the old
physical column.  This module stores that metadata as one JSON file
at the table root::

    _table_schema.json
    {"version": N, "columns": [
        {"name": "price_usd", "type": "Float64", "aliases": ["o_totalprice"]},
        {"name": "channel",   "type": "String",  "default": "web"},
        ...]}

Column order IS the table schema.  ``aliases`` lists prior physical
names newest-first (a part holds at most one of name/aliases).
``default`` is the ADD default, materialized for parts that predate
the column; an ADD without default reads as NULL.  Type changes
(ALTER MODIFY COLUMN) are NOT metadata-only in ClickHouse either —
unsupported here, alter functions refuse name/type conflicts up
front.
"""

from __future__ import annotations

import json
import os
from typing import Optional

TABLE_SCHEMA_FILE = "_table_schema.json"


def table_schema_path(dir_path: str) -> str:
    return os.path.join(dir_path, TABLE_SCHEMA_FILE)


def load_table_schema(dir_path: str) -> Optional[dict]:
    """Validated table metadata for ``dir_path`` or None.  Malformed
    metadata raises — silently ignoring it would flip every evolved
    read back to raw physical schemas."""
    p = table_schema_path(dir_path)
    try:
        with open(p) as f:
            meta = json.load(f)
    except OSError:
        return None
    except ValueError as ex:
        raise ValueError(f"corrupt table schema {p!r}: {ex}") from ex
    try:
        cols = meta["columns"]
        assert isinstance(cols, list) and cols
        for c in cols:
            assert isinstance(c["name"], str) and isinstance(c["type"], str)
            assert all(isinstance(a, str) for a in c.get("aliases", []))
    except (KeyError, TypeError, AssertionError) as ex:
        raise ValueError(f"malformed table schema {p!r}") from ex
    return meta


def save_table_schema(dir_path: str, meta: dict) -> None:
    p = table_schema_path(dir_path)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, p)


def copy_table_schema(src_dir: str, dst_dir: str) -> None:
    """Carry the metadata wherever parts are staged/linked — a staged
    read without it would resolve raw physical schemas (renames break,
    defaults vanish)."""
    src = table_schema_path(src_dir)
    if os.path.exists(src):
        import shutil

        os.makedirs(dst_dir, exist_ok=True)
        shutil.copy2(src, table_schema_path(dst_dir))


def _init_meta(dir_path: str) -> dict:
    """Version-1 metadata derived from the first part's header (the
    physical schema every pre-ALTER part shares)."""
    from ..filesystem import resolve_paths
    from .codec import read_file_schema

    paths = resolve_paths(dir_path)
    if not paths:
        raise FileNotFoundError(
            f"cannot ALTER empty table {dir_path!r}: no parts to derive "
            "the current schema from"
        )
    cols = read_file_schema(paths[0])
    return {
        "version": 1,
        "columns": [{"name": n, "type": t.name} for n, t in cols],
    }


def _load_or_init(dir_path: str) -> dict:
    return load_table_schema(dir_path) or _init_meta(dir_path)


def alter_add_column(
    dir_path: str, name: str, ch_type: str, default=None
) -> dict:
    """``ALTER TABLE ADD COLUMN name type [DEFAULT literal]`` —
    metadata only; existing parts read the default (NULL when none)."""
    from .types import parse_type

    parse_type(ch_type)  # validate up front, not at first read
    meta = _load_or_init(dir_path)
    taken = {c["name"] for c in meta["columns"]} | {
        a for c in meta["columns"] for a in c.get("aliases", [])
    }
    if name in taken:
        raise ValueError(f"column {name!r} already exists (or existed)")
    col: dict = {"name": name, "type": ch_type}
    if default is not None:
        col["default"] = default
    meta["columns"].append(col)
    meta["version"] = int(meta.get("version", 1)) + 1
    save_table_schema(dir_path, meta)
    return meta


def alter_drop_column(dir_path: str, name: str) -> dict:
    """``ALTER TABLE DROP COLUMN`` — metadata only; the physical
    payload stays in old parts and is byte-skipped at read."""
    meta = _load_or_init(dir_path)
    keep = [c for c in meta["columns"] if c["name"] != name]
    if len(keep) == len(meta["columns"]):
        raise ValueError(f"no such column {name!r}")
    if not keep:
        raise ValueError("cannot drop the last column")
    meta["columns"] = keep
    meta["version"] = int(meta.get("version", 1)) + 1
    save_table_schema(dir_path, meta)
    return meta


def alter_rename_column(dir_path: str, old: str, new: str) -> dict:
    """``ALTER TABLE RENAME COLUMN`` — metadata only; the old physical
    name joins the column's aliases so every part epoch resolves."""
    meta = _load_or_init(dir_path)
    taken = {c["name"] for c in meta["columns"]}
    if new in taken:
        raise ValueError(f"column {new!r} already exists")
    for c in meta["columns"]:
        if c["name"] == old:
            c.setdefault("aliases", []).insert(0, old)
            c["name"] = new
            meta["version"] = int(meta.get("version", 1)) + 1
            save_table_schema(dir_path, meta)
            return meta
    raise ValueError(f"no such column {old!r}")
