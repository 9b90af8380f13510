"""Whole-stream content compression for url()/file()/s3() reads.

ClickHouse's file()/url()/s3() table functions auto-detect compression
from the filename extension and accept an explicit ``compression``
argument (docs: sql-reference/table-functions/file — 'gz', 'br', 'xz',
'zst', 'lz4', 'bz2'; url() additionally honors the HTTP
``Content-Encoding`` response header).  This module is the shared
sniff-and-wrap layer in FRONT of the wire-format decoders — transport
compression composes with every format, including the headerless
structure-requiring spellings.

Nothing here buffers the whole body: gzip/zstd/brotli/lz4 ride
pyarrow's streaming ``CompressedInputStream`` (the same C++ codecs
Spark's own file sources use), bz2/xz ride the stdlib streaming
readers, and an ``io.BufferedReader`` on top restores ``readline()``
for the line-oriented text decoders.

The write half mirrors operators/outfile.py (INTO OUTFILE sniffs the
FINAL filename), closing the r14 export/reimport asymmetry: anything
OUTFILE writes — ``data.csv.gz``, ``data.native.zst`` — file()/url()
now reads back losslessly.

This is engine-side compression the reference explicitly leaves to its
host (reference README.md:133 "Compression support" unchecked); the
ClickHouse-frame codec for Native files is separate (compress.py).

Scale note (100 TB): a compressed stream is NOT splittable at byte
offsets, so one compressed file stays one Spark partition —
parallelism comes from many files, exactly how ClickHouse itself
shards compressed exports (and how url() globs / file() wildcards fan
out here).
"""

from __future__ import annotations

import io
from typing import BinaryIO, Optional

# canonical method -> accepted aliases (ClickHouse spellings included)
_ALIASES = {
    "none": {"none"},
    "auto": {"auto", ""},
    "gzip": {"gzip", "gz"},
    "zstd": {"zstd", "zst"},
    "brotli": {"brotli", "br"},
    "lz4": {"lz4"},
    "bz2": {"bz2"},
    "xz": {"xz", "lzma"},
}
_CANONICAL = {a: c for c, al in _ALIASES.items() for a in al}

# extension (lowercased, final suffix) -> canonical method
_EXT_TO_METHOD = {
    ".gz": "gzip",
    ".gzip": "gzip",
    ".zst": "zstd",
    ".zstd": "zstd",
    ".br": "brotli",
    ".lz4": "lz4",
    ".bz2": "bz2",
    ".xz": "xz",
    ".lzma": "xz",
}

# HTTP Content-Encoding token -> canonical method (identity = none)
_HTTP_ENCODINGS = {
    "gzip": "gzip",
    "x-gzip": "gzip",
    "zstd": "zstd",
    "br": "brotli",
    "identity": "none",
}

_PYARROW_CODECS = {"gzip", "zstd", "brotli", "lz4"}


def normalize_compression(name: Optional[str]) -> str:
    """Canonical method name ('auto' when unset); unknown/unstreamable
    methods refuse by name."""
    key = (name or "auto").strip().lower()
    method = _CANONICAL.get(key)
    if method is None:
        raise ValueError(
            f"unsupported compression {name!r}; one of "
            f"{sorted(c for c in _ALIASES if c != 'auto')} (or 'auto' "
            "to sniff from the filename extension)"
        )
    return method


def sniff_compression(path_or_url: str) -> str:
    """Compression method implied by the filename extension — the
    ClickHouse auto-detection.  URL query strings / fragments are
    stripped first so ``data.csv.gz?sig=...`` sniffs as gzip."""
    p = path_or_url.split("?", 1)[0].split("#", 1)[0].rstrip("/")
    name = p.rsplit("/", 1)[-1].lower()
    dot = name.rfind(".")
    if dot < 0:
        return "none"
    return _EXT_TO_METHOD.get(name[dot:], "none")


def resolve_compression(
    path_or_url: str,
    option: Optional[str] = None,
    content_encoding: Optional[str] = None,
) -> str:
    """Effective method: an explicit option wins; then the HTTP
    Content-Encoding header (url() only); then the extension sniff."""
    method = normalize_compression(option)
    if method != "auto":
        return method
    if content_encoding:
        enc = content_encoding.strip().lower()
        mapped = _HTTP_ENCODINGS.get(enc)
        if mapped is None:
            raise ValueError(
                f"unsupported HTTP Content-Encoding {content_encoding!r}; "
                f"one of {sorted(_HTTP_ENCODINGS)}"
            )
        return mapped
    return sniff_compression(path_or_url)


def open_compressed(raw, method: str) -> BinaryIO:
    """Streaming decompressing reader over ``raw`` (any object with
    ``read``); 'none' returns ``raw`` unwrapped.  The result supports
    ``read`` AND ``readline`` (the text decoders need both)."""
    if method in ("none", "auto"):
        return raw
    if method in _PYARROW_CODECS:
        import pyarrow as pa

        inner = (
            raw
            if isinstance(raw, pa.NativeFile)
            else pa.PythonFile(raw, mode="r")
        )
        return io.BufferedReader(pa.CompressedInputStream(inner, method))
    if method == "bz2":
        import bz2

        return bz2.open(raw)
    if method == "xz":
        import lzma

        return lzma.open(raw)
    raise ValueError(f"unsupported compression method {method!r}")


def compress_bytes(data: bytes, method: str) -> bytes:
    """One-shot compress (the url() INSERT POST body is one request by
    contract, so in-memory is fine there).  Emits the STANDARD container
    for each method (gzip member / zstd frame / lz4 frame / raw brotli)
    — byte-compatible with open_compressed on the read side."""
    if method in ("none", "auto"):
        return data
    if method == "gzip":
        import gzip

        return gzip.compress(data)
    if method in _PYARROW_CODECS:
        import pyarrow as pa

        return pa.Codec(method).compress(data, asbytes=True)
    if method == "bz2":
        import bz2

        return bz2.compress(data)
    if method == "xz":
        import lzma

        return lzma.compress(data)
    raise ValueError(f"unsupported compression method {method!r}")


def wrap_compressed_write(raw, method: str):
    """Streaming compressing writer over an already-open binary sink
    (e.g. a pyarrow.fs output stream — the s3() INSERT path).  'none'
    returns ``raw``; closing the wrapper flushes the frame but the
    CALLER owns closing ``raw`` (stdlib wrappers don't close a
    fileobj; pyarrow's CompressedOutputStream does — callers close
    both, second close is a no-op)."""
    if method in ("none", "auto"):
        return raw
    if method in _PYARROW_CODECS:
        import pyarrow as pa

        inner = (
            raw
            if isinstance(raw, pa.NativeFile)
            else pa.PythonFile(raw, mode="w")
        )
        return pa.CompressedOutputStream(inner, method)
    if method == "bz2":
        import bz2

        return bz2.BZ2File(raw, "wb")
    if method == "xz":
        import lzma

        return lzma.LZMAFile(raw, "wb")
    raise ValueError(f"unsupported compression method {method!r}")


def open_compressed_write(path: str, method: str):
    """Streaming compressing writer to a local ``path`` ('none' = plain
    binary file).  Closing the returned object closes the file."""
    if method in ("none", "auto"):
        return open(path, "wb")
    if method in _PYARROW_CODECS:
        import pyarrow as pa

        return pa.CompressedOutputStream(pa.OSFile(path, "wb"), method)
    if method == "bz2":
        import bz2

        return bz2.open(path, "wb")
    if method == "xz":
        import lzma

        return lzma.open(path, "wb")
    raise ValueError(f"unsupported compression method {method!r}")
