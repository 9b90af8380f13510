"""BACKUP / RESTORE for Native table directories — the ClickHouse
``BACKUP TABLE ... TO Disk('backups', ...)`` surface
(docs: operations/backup), including INCREMENTAL backups via
``base_backup``.

Model (matching ClickHouse's file-level backup semantics — parts are
immutable, so a backup is a file snapshot, not a logical dump):

* ``backup_table`` snapshots every table file (parts, sidecars, delete
  masks, ``_table_schema.json``) into the backup directory by
  HARD-LINK (copy fallback), and writes ``_backup_manifest.json``:
  per-file size / mtime_ns / optional md5.  Immutable parts make the
  links safe: mutations never rewrite a part in place, they write new
  directories.
* ``base_backup=<prior backup>`` makes it INCREMENTAL: files whose
  (size, mtime_ns) — or md5 when checksums are on — match the base's
  manifest are recorded as ``from_base`` and not stored again; at
  100 TB the nightly backup stores only the parts that changed, which
  is exactly ClickHouse's incremental contract.
* ``restore_table`` materializes a destination directory by resolving
  the base chain (nearest backup wins per file), verifying sizes (and
  md5 when recorded) BEFORE placing files, and refusing to restore
  over a non-empty destination.
* ``verify_backup`` re-checks every stored file against its manifest
  row — the scrub job.

Everything is driver-side metadata plus hard-links: no row ever
decodes, so backup cost scales with changed bytes, not table size.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable, Optional

MANIFEST = "_backup_manifest.json"


def _file_md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _table_files(src_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            p = os.path.join(root, f)
            out.append(os.path.relpath(p, src_dir))
    return sorted(out)


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def backup_table(
    src_dir: str,
    backup_dir: str,
    *,
    base_backup: Optional[str] = None,
    checksum: bool = False,
    now_fn: Callable[[], float] = time.time,
) -> dict:
    """Snapshot ``src_dir`` into ``backup_dir``; returns the manifest.
    With ``base_backup``, unchanged files are referenced, not stored."""
    if os.path.exists(os.path.join(backup_dir, MANIFEST)):
        raise ValueError(f"{backup_dir!r} already holds a backup")
    base_manifest = None
    if base_backup is not None:
        with open(os.path.join(base_backup, MANIFEST)) as f:
            base_manifest = json.load(f)

    files: dict[str, dict] = {}
    stored = 0
    for rel in _table_files(src_dir):
        src = os.path.join(src_dir, rel)
        st = os.stat(src)
        row: dict = {"size": st.st_size, "mtime_ns": st.st_mtime_ns}
        if checksum:
            row["md5"] = _file_md5(src)
        base_row = (base_manifest or {}).get("files", {}).get(rel)
        unchanged = base_row is not None and (
            (
                "md5" in row
                and base_row.get("md5") == row["md5"]
            )
            or (
                "md5" not in row
                and base_row.get("size") == row["size"]
                and base_row.get("mtime_ns") == row["mtime_ns"]
            )
        )
        if unchanged:
            row["from_base"] = True
        else:
            _link_or_copy(src, os.path.join(backup_dir, "data", rel))
            stored += 1
        files[rel] = row

    manifest = {
        "created_at": now_fn(),
        "source": os.path.abspath(src_dir),
        "base_backup": (
            os.path.abspath(base_backup) if base_backup else None
        ),
        "checksum": bool(checksum),
        "files": files,
        "stored_files": stored,
    }
    os.makedirs(backup_dir, exist_ok=True)
    with open(os.path.join(backup_dir, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def _resolve(backup_dir: str, rel: str, row: dict) -> str:
    """Path of the stored bytes for ``rel``, following the base chain."""
    if not row.get("from_base"):
        return os.path.join(backup_dir, "data", rel)
    with open(os.path.join(backup_dir, MANIFEST)) as f:
        manifest = json.load(f)
    base = manifest.get("base_backup")
    if not base:
        raise ValueError(f"{rel!r} marked from_base but no base_backup")
    with open(os.path.join(base, MANIFEST)) as f:
        base_manifest = json.load(f)
    base_row = base_manifest["files"].get(rel)
    if base_row is None:
        raise ValueError(f"{rel!r} missing from base backup {base!r}")
    return _resolve(base, rel, base_row)


def restore_table(backup_dir: str, dest_dir: str, *, verify: bool = True) -> dict:
    """Materialize the backup into ``dest_dir`` (must be empty/absent);
    verifies sizes (and md5 when recorded) BEFORE placing files."""
    with open(os.path.join(backup_dir, MANIFEST)) as f:
        manifest = json.load(f)
    if os.path.isdir(dest_dir) and os.listdir(dest_dir):
        raise ValueError(
            f"restore destination {dest_dir!r} is not empty — refusing "
            "to overwrite"
        )
    placed = 0
    for rel, row in manifest["files"].items():
        src = _resolve(backup_dir, rel, row)
        if verify:
            st = os.stat(src)
            if st.st_size != row["size"]:
                raise ValueError(
                    f"backup file {rel!r} size mismatch "
                    f"({st.st_size} != {row['size']}) — backup corrupt"
                )
            if "md5" in row and _file_md5(src) != row["md5"]:
                raise ValueError(
                    f"backup file {rel!r} md5 mismatch — backup corrupt"
                )
        _link_or_copy(src, os.path.join(dest_dir, rel))
        placed += 1
    return {"restored_files": placed, "dest_dir": dest_dir}


def verify_backup(backup_dir: str) -> dict:
    """Scrub: every manifest row resolves and matches size/md5."""
    with open(os.path.join(backup_dir, MANIFEST)) as f:
        manifest = json.load(f)
    bad = []
    for rel, row in manifest["files"].items():
        try:
            src = _resolve(backup_dir, rel, row)
            st = os.stat(src)
            if st.st_size != row["size"]:
                bad.append((rel, "size"))
            elif "md5" in row and _file_md5(src) != row["md5"]:
                bad.append((rel, "md5"))
        except (OSError, ValueError) as e:
            bad.append((rel, str(e)))
    return {"ok": not bad, "files": len(manifest["files"]), "bad": bad}


def freeze_partition(
    table_dir: str, partition: str, *, shadow_name: str = None
) -> dict:
    """``ALTER TABLE ... FREEZE PARTITION`` (docs: statements/alter/
    partition#freeze-partition): hard-link snapshot of ONE partition
    directory into the table's ``shadow/<increment>/`` area — the
    literal ClickHouse on-disk layout. Zero data movement (links share
    inodes); later mutations/compactions REPLACE files (the engine
    never rewrites in place), so the frozen names keep the old bytes.

    ``partition`` is the hive component (``key=value``) or ``""`` to
    freeze a flat table's whole part set. Returns {shadow_dir,
    n_files}. The increment counter mirrors ClickHouse's
    ``shadow/increment.txt``."""
    import json as _json

    src = os.path.join(table_dir, partition) if partition else table_dir
    if not os.path.isdir(src):
        raise ValueError(f"no partition directory {src!r}")
    shadow_root = os.path.join(table_dir, "shadow")
    os.makedirs(shadow_root, exist_ok=True)
    inc_path = os.path.join(shadow_root, "increment.txt")
    inc = 0
    if os.path.exists(inc_path):
        with open(inc_path) as f:
            inc = int(f.read().strip() or 0)
    inc += 1
    name = shadow_name or str(inc)
    dst_root = os.path.join(shadow_root, name, partition or "")
    if os.path.exists(os.path.join(shadow_root, name)):
        raise ValueError(f"shadow snapshot {name!r} already exists")
    os.makedirs(dst_root, exist_ok=True)
    n = 0
    shadow_prefix = os.path.abspath(shadow_root) + os.sep
    for root, _dirs, files in os.walk(src):
        # never recurse into the shadow area itself (os.sep-terminated
        # prefix: a sibling dir named e.g. 'shadow_old' must NOT match)
        root_abs = os.path.abspath(root)
        if root_abs == os.path.abspath(shadow_root) or root_abs.startswith(
            shadow_prefix
        ):
            continue
        rel = os.path.relpath(root, src)
        for fn in files:
            if not (
                fn.endswith(".clickhouse")
                or (fn.startswith("_") and fn.endswith(".stats.json"))
            ):
                continue
            d = os.path.join(dst_root, rel) if rel != "." else dst_root
            os.makedirs(d, exist_ok=True)
            _link_or_copy(os.path.join(root, fn), os.path.join(d, fn))
            n += 1
    with open(inc_path, "w") as f:
        f.write(str(inc))
    with open(os.path.join(shadow_root, name, "_FROZEN.json"), "w") as f:
        _json.dump({"partition": partition, "n_files": n}, f)
    return {"shadow_dir": os.path.join(shadow_root, name), "n_files": n}
