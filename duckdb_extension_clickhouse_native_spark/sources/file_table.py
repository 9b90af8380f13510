"""ClickHouse ``file()`` table function (docs: sql-reference/
table-functions/file): read local files in a named wire format.

Spark-first analogue of the url() family (url_table.py) with a
filesystem transport: ``clickhouse_file`` DataSource + ``file_table``
helper + the ``clickhouse_file(path, fmt[, structure])`` SQL UDTF.
Paths take the ClickHouse spelling — comma-separated lists, ``{N..M}``
/ ``{a,b}`` brace globs (shared with url()), plus filesystem ``*`` /
``?`` wildcards — and every matched file becomes ONE input partition,
so a directory of N shards reads with N-way parallelism.  Formats and
the ``structure`` argument behave exactly as url(): self-describing
spellings (Native / *WithNamesAndTypes / ArrowStream / Parquet / ORC)
decode directly; headerless plain spellings need a structure.

The write half is ``INTO OUTFILE`` (operators/outfile.py) — ClickHouse
splits the same way (file() reads, OUTFILE writes one local file).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .url_table import (
    _VIRTUAL_COLS,
    _inference_mode,
    merge_inferred_schemas,
    probe_many,
    _WITHNAMES_DECODERS,
    _add_virtual_fields,
    _append_virtuals,
    _conform_batch,
    _decode_stream,
    _plan_arrow_types,
    _split_top_level_commas,
    _structured_decoder_for,
    _truthy,
    format_settings,
    structure_is_authoritative,
    expand_url_globs,
    validate_format,
)


# archive member access — ClickHouse file('archive :: member') (docs:
# sql-reference/table-functions/file, 'Reading from archives'): zip
# via zipfile, tar (+ .gz/.bz2/.xz via tarfile's own transparent
# modes, .zst/.lz4/.br through the contentcodec wrapper); 7z has no
# stdlib reader — named refusal
_TAR_SUFFIXES = (".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tbz2",
                 ".tar.xz", ".txz", ".tar.zst", ".tar.lz4", ".tar.br")


def _is_archive(path: str) -> bool:
    low = path.lower()
    return low.endswith(".zip") or low.endswith(_TAR_SUFFIXES) or \
        low.endswith(".7z")


def _open_tar(path: str):
    import tarfile

    low = path.lower()
    if low.endswith((".tar.zst", ".tar.lz4", ".tar.br")):
        from ..native.contentcodec import open_compressed, sniff_compression

        raw = open_compressed(open(path, "rb"), sniff_compression(path))
        return tarfile.open(fileobj=raw, mode="r|")
    return tarfile.open(path, "r:*")


def _list_archive_members(path: str, pattern: str) -> list:
    """Member names in ``path`` matching ``pattern`` (fnmatch ``*``/
    ``?``; a non-wildcard member must exist).  Directories excluded."""
    low = path.lower()
    if low.endswith(".7z"):
        raise ValueError(
            f"file(): 7z archives are not supported ({path!r}) — use "
            "zip or tar (.tar, .tar.gz/.bz2/.xz/.zst/.lz4/.br)"
        )
    if low.endswith(".zip"):
        import zipfile

        with zipfile.ZipFile(path) as zf:
            names = [n for n in zf.namelist() if not n.endswith("/")]
    else:
        with _open_tar(path) as tf:
            names = [m.name for m in tf if m.isfile()]
    if any(c in pattern for c in "*?["):
        # separator-aware glob: '*' must not cross '/' — the same
        # semantics file() paths and the object-store listings use
        from ..filesystem import _glob_to_regex

        rx = _glob_to_regex(pattern)
        return sorted(n for n in names if rx.match(n))
    if pattern in names:
        return [pattern]
    raise FileNotFoundError(
        f"file(): archive {path!r} has no member {pattern!r} "
        f"(members: {sorted(names)[:10]}{'...' if len(names) > 10 else ''})"
    )


def _open_archive_member(arch: str, member: str):
    """Binary stream of one archive member.  The returned stream keeps
    a reference to its container so GC never closes the underlying
    file mid-read."""
    low = arch.lower()
    if low.endswith(".zip"):
        import zipfile

        zf = zipfile.ZipFile(arch)
        stream = zf.open(member)
        stream._chsql_container = zf  # lifetime pin
        return stream
    tf = _open_tar(arch)
    # walk to the member — works in random-access AND streaming modes
    # (the contentcodec-wrapped .tar.zst tars are sequential-only)
    stream = None
    for m in tf:
        if m.name == member and m.isfile():
            stream = tf.extractfile(m)
            break
    if stream is None:
        raise FileNotFoundError(
            f"file(): archive {arch!r} has no member {member!r}"
        )
    stream._chsql_container = tf  # lifetime pin
    return stream


def _open_file(path: str, compression):
    """Open + transparent decompression (extension sniff unless an
    explicit ``compression`` is given — ClickHouse file() semantics).
    ``archive :: member`` paths open the member stream; the
    compression sniff then applies to the MEMBER name (a ``data.csv.gz``
    inside a tar decompresses twice, correctly)."""
    from ..native.contentcodec import open_compressed, resolve_compression

    if "::" in path:
        arch, member = (s.strip() for s in path.split("::", 1))
        raw = _open_archive_member(arch, member)
        method = resolve_compression(member, compression)
    else:
        raw = open(path, "rb")
        method = resolve_compression(path, compression)
    if method == "none":
        return raw
    try:
        return open_compressed(raw, method)
    except Exception:
        raw.close()
        raise


def expand_file_paths(spec: str) -> list:
    """Resolve a ClickHouse file() path spec: top-level comma split,
    brace globs, then filesystem ``*``/``?`` wildcards per element.
    The ``archive :: member`` spelling (docs: table-functions/file,
    'Reading from archives') expands BOTH sides — archive paths by the
    rules above, members by ``*``/``?`` fnmatch over the listing — and
    every matched (archive, member) pair is one partition, spelled
    ``archive::member``.  Sorted for deterministic partition order;
    missing non-wildcard paths/members raise (a wildcard matching
    nothing contributes nothing)."""
    import glob as _glob
    import os

    def _expand_plain(piece: str) -> list:
        got: list = []
        for braced in expand_url_globs(piece):
            if "*" in braced or "?" in braced:
                got.extend(sorted(_glob.glob(braced)))
            elif os.path.isfile(braced):
                got.append(braced)
            else:
                raise FileNotFoundError(
                    f"file(): no such file {braced!r} (wildcards allowed: "
                    "{N..M}, {a,b}, *, ?)"
                )
        return got

    out: list = []
    for piece in _split_top_level_commas(spec):
        piece = piece.strip()
        if not piece:
            continue
        if "::" in piece:
            arch_spec, member_spec = (
                s.strip() for s in piece.split("::", 1)
            )
            if not member_spec:
                raise ValueError(
                    f"file(): 'archive :: member' needs a member "
                    f"pattern after '::': {piece!r}"
                )
            for arch in _expand_plain(arch_spec):
                if not _is_archive(arch):
                    raise ValueError(
                        f"file(): {arch!r} is not a supported archive "
                        "(zip / tar / tar.gz|bz2|xz|zst|lz4|br)"
                    )
                out.extend(
                    f"{arch}::{m}"
                    for m in _list_archive_members(arch, member_spec)
                )
            continue
        out.extend(_expand_plain(piece))
    return out


def _probe_file_schema(
    path: str,
    fmt: str,
    structure: Optional[str],
    compression: Optional[str] = None,
    settings: Optional[dict] = None,
):
    from pyspark.sql.pandas.types import from_arrow_schema

    from ..native.contentcodec import normalize_compression

    normalize_compression(compression)  # refusal BEFORE any open
    if structure_is_authoritative(fmt, structure):
        from pyspark.sql.types import StructField, StructType

        from .native_datasource import _ch_to_spark
        from .url_table import parse_structure

        validate_format(fmt, structure, settings)
        return StructType(
            [
                StructField(n, _ch_to_spark(t), True)
                for n, t in parse_structure(structure)
            ]
        )
    validate_format(fmt, structure, settings)
    with _open_file(path, compression) as f:
        blocks = _decode_stream(f, fmt, structure, settings)
        try:
            first = next(iter(blocks))
        except StopIteration:
            raise ValueError(
                f"file() cannot infer a schema from a zero-block "
                f"{fmt} file at {path!r}"
            )
    return from_arrow_schema(first.to_record_batch().schema)


class FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ClickHouseFileReader(DataSourceReader):
    def __init__(self, options: dict, plan_schema=None):
        from ..native.contentcodec import normalize_compression

        self.paths = expand_file_paths(options.get("path") or "")
        if not self.paths:
            raise ValueError("clickhouse_file requires a path option")
        self.fmt = options.get("format", "CSVWithNamesAndTypes")
        self.structure = (options.get("structure") or "").strip() or None
        self.settings = format_settings(options)
        validate_format(self.fmt, self.structure, self.settings)
        self.compression = options.get("compression")
        normalize_compression(self.compression)  # plan-time refusal
        self.fill_missing = _inference_mode(options) == "union"
        self.virtuals = _truthy(options.get("virtual_columns"))
        self.plan_schema = plan_schema
        names = list(plan_schema.fieldNames()) if plan_schema else None
        if names is not None and self.virtuals:
            names = [n for n in names if n not in _VIRTUAL_COLS]
        self.field_names = names
        self._arrow_types = None

    def partitions(self):
        return [FilePartition(p) for p in self.paths]

    def read(self, partition: FilePartition) -> Iterator:
        if self._arrow_types is None:
            self._arrow_types = _plan_arrow_types(self.plan_schema)
        with _open_file(partition.path, self.compression) as f:
            for blk in _decode_stream(
                f, self.fmt, self.structure, self.settings
            ):
                rb = _conform_batch(
                    blk.to_record_batch(),
                    self.field_names,
                    self._arrow_types,
                    "file()",
                    partition.path,
                    fill_missing=self.fill_missing,
                )
                if self.virtuals:
                    rb = _append_virtuals(rb, partition.path)
                yield rb


class ClickHouseFileDataSource(DataSource):
    """``spark.read.format("clickhouse_file").option("path", ...)
    .option("format", "CSVWithNamesAndTypes").load()``"""

    @classmethod
    def name(cls) -> str:
        return "clickhouse_file"

    def schema(self):
        memo = getattr(self, "_schema_memo", None)
        if memo is not None:
            return memo
        opts = dict(self.options)
        paths = expand_file_paths(opts.get("path") or "")
        if not paths:
            raise ValueError("clickhouse_file requires a path option")
        fmt = opts.get("format", "CSVWithNamesAndTypes")
        structure = (opts.get("structure") or "").strip() or None
        settings = format_settings(opts)
        if (
            _inference_mode(opts) == "union"
            and len(paths) > 1
            and not structure_is_authoritative(fmt, structure)
        ):
            schema = merge_inferred_schemas(
                probe_many(
                    lambda p: _probe_file_schema(
                        p, fmt, structure, opts.get("compression"), settings
                    ),
                    paths,
                )
            )
        else:
            schema = _probe_file_schema(
                paths[0], fmt, structure, opts.get("compression"), settings
            )
        if _truthy(opts.get("virtual_columns")):
            schema = _add_virtual_fields(schema)
        self._schema_memo = schema
        return self._schema_memo

    def reader(self, schema) -> ClickHouseFileReader:
        return ClickHouseFileReader(dict(self.options), schema)


def file_table(
    spark: SparkSession,
    path: str,
    fmt: str = "CSVWithNamesAndTypes",
    structure: Optional[str] = None,
    compression: Optional[str] = None,
    virtual_columns: bool = False,
    schema_inference_mode: Optional[str] = None,
    format_regexp: Optional[str] = None,
    format_regexp_skip_unmatched: bool = False,
) -> DataFrame:
    """The ``file(path, format[, structure[, compression]])`` table
    function as a DataFrame — one partition per matched file.
    ``compression`` defaults to the extension sniff (gz/zst/br/lz4/
    bz2/xz — anything INTO OUTFILE writes reads back);
    ``virtual_columns`` appends ``_path``/``_file`` per file."""
    from ..plans.base import ensure_session

    ensure_session(spark)
    r = (
        spark.read.format("clickhouse_file")
        .option("path", path)
        .option("format", fmt)
    )
    if structure:
        r = r.option("structure", structure)
    if compression:
        r = r.option("compression", compression)
    if virtual_columns:
        r = r.option("virtual_columns", "true")
    if schema_inference_mode:
        r = r.option("schema_inference_mode", schema_inference_mode)
    if format_regexp:
        r = r.option("format_regexp", format_regexp)
    if format_regexp_skip_unmatched:
        r = r.option("format_regexp_skip_unmatched", "true")
    return r.load()


def make_file_udtf():
    """UDTF for ``clickhouse_file(path, fmt[, structure])`` — the
    SQL-invocable convenience shim (rows funnel through one worker;
    the DataSource above is the scale path)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class ClickHouseFileUDTF:
        @staticmethod
        def analyze(
            path: AnalyzeArgument,
            fmt: Optional[AnalyzeArgument] = None,
            structure: Optional[AnalyzeArgument] = None,
            compression: Optional[AnalyzeArgument] = None,
        ) -> AnalyzeResult:
            if path.value is None:
                raise ValueError(
                    "clickhouse_file(path, fmt[, structure[, "
                    "compression]]) requires a literal path"
                )
            f = "CSVWithNamesAndTypes" if fmt is None else str(fmt.value)
            st = None if structure is None else str(structure.value)
            comp = None if compression is None else str(compression.value)
            paths = expand_file_paths(str(path.value))
            if not paths:
                raise FileNotFoundError(
                    f"clickhouse_file: nothing matches {path.value!r}"
                )
            return AnalyzeResult(
                schema=_probe_file_schema(paths[0], f, st, comp)
            )

        def eval(
            self,
            path: str,
            fmt: Optional[str] = None,
            structure: Optional[str] = None,
            compression: Optional[str] = None,
        ) -> Iterator[tuple]:
            f = fmt or "CSVWithNamesAndTypes"
            names = None
            for one in expand_file_paths(path):
                with _open_file(one, compression) as fh:
                    for blk in _decode_stream(fh, f, structure):
                        rb = blk.to_record_batch()
                        if names is None:
                            names = list(rb.schema.names)
                        elif set(rb.schema.names) != set(names):
                            raise ValueError(
                                f"clickhouse_file: {one!r} columns "
                                f"{sorted(rb.schema.names)} != "
                                f"{sorted(names)}"
                            )
                        for row in rb.to_pylist():
                            yield tuple(row[n] for n in names)

    return udtf(ClickHouseFileUDTF)


def file_cluster_table(
    spark: SparkSession, cluster: str, path: str, *args, **kwargs
) -> DataFrame:
    """``fileCluster('cluster', path, ...)`` (docs: table-functions/
    fileCluster): ClickHouse fans the matched-file list across cluster
    nodes that share the path; Spark's per-file partitions already
    schedule across every executor, so the spelling validates its
    argument and delegates to :func:`file_table`."""
    if not (cluster or "").strip():
        raise ValueError("fileCluster() needs a non-empty cluster name")
    return file_table(spark, path, *args, **kwargs)


def file_insert(
    df,
    path: str,
    fmt: str = "CSVWithNamesAndTypes",
    *,
    partition_by: Optional[str] = None,
) -> int:
    """``INSERT INTO FUNCTION file(path, fmt) [PARTITION BY col]`` —
    the local-path spelling of the s3() write half (same machinery:
    one file, or one file per partition value via the
    ``{_partition_id}`` placeholder; compression sniffed from the
    final name).  Relative/absolute local paths accepted."""
    import os

    from .s3_table import s3_insert

    if "://" in path:
        raise ValueError(
            f"file() INSERT takes a local path, got a URI {path!r} — "
            "use s3_insert for scheme:// destinations"
        )
    return s3_insert(
        df, f"file://{os.path.abspath(path)}", fmt,
        partition_by=partition_by,
    )
