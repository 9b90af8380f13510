"""Filesystem abstraction for Native-file path resolution and reads.

At 100 TB the data lives on object storage or HDFS, not the local
disk, so every read-side path operation routes through here:

* plain paths (no ``scheme://``) take the local fast path —
  ``os`` / ``glob`` / builtin ``open``, zero overhead;
* URI paths (``file://``, ``s3://``, ``hdfs://``, ``gs://``, ...) go
  through ``pyarrow.fs.FileSystem.from_uri`` — the same FS layer
  Spark's own parquet reader rides, credential handling included.

``file://`` URIs exercise the remote code path against local files,
which is how the tests cover it without an object store.

The write path (ClickHouseNativeWriter) remains local-only: writes on
a real cluster land one part-file per task, which needs
commit-protocol support per store; reads are the 100 TB-critical
surface (the reference is read-only too, lib.rs).
"""

from __future__ import annotations

import glob as globmod
import io
import os
import posixpath
from typing import BinaryIO, Tuple

_GLOB_CHARS = ("*", "?", "[")

_DATA_SUFFIXES = (".clickhouse", ".native", ".bin")


def is_uri(path: str) -> bool:
    return "://" in path


def strip_scheme(path: str) -> str:
    """Scheme-less form of a URI (no-op for local paths) — the ONE
    place URI normalization for relative-path math lives."""
    return path.split("://", 1)[1] if is_uri(path) else path


def _glob_to_regex(pat: str):
    """Glob -> regex where ``*`` and ``?`` do NOT cross ``/`` (the
    glob.glob semantics the local path already has)."""
    import re

    out = []
    i = 0
    while i < len(pat):
        c = pat[i]
        if c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = pat.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                out.append(pat[i : j + 1])
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return re.compile("^" + "".join(out) + "$")


def _fs_and_path(path: str) -> Tuple[object, str, str]:
    """(pyarrow FileSystem, in-fs path, scheme prefix for round-trips)."""
    from pyarrow import fs as pafs

    scheme = path.split("://", 1)[0]
    fs, p = pafs.FileSystem.from_uri(path)
    return fs, p, scheme


def _rebuild(scheme: str, p: str) -> str:
    # LocalFileSystem paths are absolute ('/x/y'); bucket-style paths
    # are 'bucket/key' — both round-trip as scheme://<path>
    return f"{scheme}://{p}"


def resolve_paths(path: str) -> list[str]:
    """Expand a file / glob / directory path into concrete data files.

    Directory listings prefer the Native-file suffixes and fall back to
    every non-underscore file (skipping _SUCCESS and friends).
    """
    if not is_uri(path):
        if os.path.isdir(path):
            out = [
                os.path.join(path, f)
                for f in os.listdir(path)
                # isfile: a key=value partition DIRECTORY may itself
                # end in a data suffix (e.g. _src_part=part-0.clickhouse
                # in per-part projection layouts) — it must be
                # descended into below, not listed as a file
                if f.endswith(_DATA_SUFFIXES)
                and os.path.isfile(os.path.join(path, f))
            ]
            # hive-style partition layout: descend into key=value
            # subdirectories (arbitrarily nested); the reader derives
            # partition columns from these path components
            for entry in os.listdir(path):
                full = os.path.join(path, entry)
                if os.path.isdir(full) and "=" in entry:
                    out.extend(resolve_paths(full))
            if not out:
                out = [
                    os.path.join(path, f)
                    for f in os.listdir(path)
                    if not f.startswith("_") and os.path.isfile(os.path.join(path, f))
                ]
            return sorted(out)
        hits = sorted(globmod.glob(path))
        if hits:
            # a glob may match directories (e.g. batch-* output of the
            # streaming sink); expand each into its data files
            out = []
            for h in hits:
                out.extend(resolve_paths(h) if os.path.isdir(h) else [h])
            return out
        return [path]

    from pyarrow.fs import FileSelector, FileType

    fs, p, scheme = _fs_and_path(path.split("*")[0].split("?")[0].split("[")[0] if any(c in path for c in _GLOB_CHARS) else path)
    if any(c in path for c in _GLOB_CHARS):
        pattern = path.split("://", 1)[1]
        base = posixpath.dirname(pattern.split("*")[0].split("?")[0].split("[")[0])
        # recursive listing + a separator-aware glob regex: a wildcard
        # in an INTERMEDIATE component ('data/*/part.native') must
        # descend into subdirectories (non-recursive listing would
        # match nothing), while '*' itself must not cross '/'
        # (fnmatch's would) — mirroring glob.glob on the local path
        infos = fs.get_file_info(FileSelector(base, recursive=True))
        rx = _glob_to_regex(pattern)
        hits = sorted(
            i.path for i in infos if i.type == FileType.File and rx.match(i.path)
        )
        return [_rebuild(scheme, h) for h in hits] if hits else [path]
    info = fs.get_file_info([p])[0]
    if info.type == FileType.Directory:
        # recursive so hive key=value subdirectories are discovered on
        # object stores exactly as on local paths; files under non-hive
        # subdirectories are excluded, and the suffix-preference /
        # non-underscore fallback applies PER DIRECTORY — the same
        # semantics the local branch gets from its per-directory
        # recursion (a global fallback would drop whole partitions
        # whose files lack the preferred suffix)
        infos = fs.get_file_info(FileSelector(p, recursive=True))
        by_dir: dict = {}
        for i in infos:
            if i.type != FileType.File:
                continue
            comps = posixpath.relpath(i.path, p).split("/")[:-1]
            if not all("=" in c for c in comps):
                continue
            by_dir.setdefault("/".join(comps), []).append(i.path)
        out = []
        for _d in sorted(by_dir):
            if _d == "":
                # top level handled after the loop: its non-underscore
                # fallback is the GLOBAL last resort (mirrors the local
                # branch's `if not out` gate) — a stray root file beside
                # hive subdirectories must not join the listing nor
                # degrade the layout to unpartitioned
                continue
            names = sorted(by_dir[_d])
            keep = [n for n in names if n.endswith(_DATA_SUFFIXES)]
            if not keep:
                keep = [
                    n
                    for n in names
                    if not posixpath.basename(n).startswith("_")
                ]
            out.extend(keep)
        top = sorted(by_dir.get("", []))
        out.extend(n for n in top if n.endswith(_DATA_SUFFIXES))
        if not out:
            out = [
                n for n in top if not posixpath.basename(n).startswith("_")
            ]
        return [_rebuild(scheme, n) for n in sorted(out)]
    return [path]


def open_input(path: str, buffer_size: int = 1 << 20) -> BinaryIO:
    """Seekable binary reader for local paths and URIs alike."""
    if not is_uri(path):
        return io.BufferedReader(open(path, "rb"), buffer_size=buffer_size)
    fs, p, _ = _fs_and_path(path)
    return fs.open_input_file(p)  # random-access (read/seek/tell)


def file_size(path: str) -> int:
    if not is_uri(path):
        return os.path.getsize(path)
    fs, p, _ = _fs_and_path(path)
    return fs.get_file_info([p])[0].size
