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
    _WITHNAMES_DECODERS,
    _conform_batch,
    _decode_stream,
    _plan_arrow_types,
    _split_top_level_commas,
    _structured_decoder_for,
    expand_url_globs,
    validate_format,
)


def expand_file_paths(spec: str) -> list:
    """Resolve a ClickHouse file() path spec: top-level comma split,
    brace globs, then filesystem ``*``/``?`` wildcards per element.
    Sorted for deterministic partition order; missing non-wildcard
    paths raise (a wildcard matching nothing contributes nothing)."""
    import glob as _glob
    import os

    out: list = []
    for piece in _split_top_level_commas(spec):
        piece = piece.strip()
        if not piece:
            continue
        for braced in expand_url_globs(piece):
            if "*" in braced or "?" in braced:
                out.extend(sorted(_glob.glob(braced)))
            elif os.path.isfile(braced):
                out.append(braced)
            else:
                raise FileNotFoundError(
                    f"file(): no such file {braced!r} (wildcards allowed: "
                    "{N..M}, {a,b}, *, ?)"
                )
    return out


def _probe_file_schema(path: str, fmt: str, structure: Optional[str]):
    from pyspark.sql.pandas.types import from_arrow_schema

    key = fmt.strip().lower()
    if structure and key not in _WITHNAMES_DECODERS:
        from pyspark.sql.types import StructField, StructType

        from .native_datasource import _ch_to_spark
        from .url_table import parse_structure

        _structured_decoder_for(fmt, structure)
        return StructType(
            [
                StructField(n, _ch_to_spark(t), True)
                for n, t in parse_structure(structure)
            ]
        )
    validate_format(fmt, structure)
    with open(path, "rb") as f:
        blocks = _decode_stream(f, fmt, structure)
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
        self.paths = expand_file_paths(options.get("path") or "")
        if not self.paths:
            raise ValueError("clickhouse_file requires a path option")
        self.fmt = options.get("format", "CSVWithNamesAndTypes")
        self.structure = (options.get("structure") or "").strip() or None
        validate_format(self.fmt, self.structure)
        self.plan_schema = plan_schema
        self.field_names = (
            list(plan_schema.fieldNames()) if plan_schema else None
        )
        self._arrow_types = None

    def partitions(self):
        return [FilePartition(p) for p in self.paths]

    def read(self, partition: FilePartition) -> Iterator:
        if self._arrow_types is None:
            self._arrow_types = _plan_arrow_types(self.plan_schema)
        with open(partition.path, "rb") as f:
            for blk in _decode_stream(f, self.fmt, self.structure):
                yield _conform_batch(
                    blk.to_record_batch(),
                    self.field_names,
                    self._arrow_types,
                    "file()",
                    partition.path,
                )


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
        self._schema_memo = _probe_file_schema(
            paths[0],
            opts.get("format", "CSVWithNamesAndTypes"),
            (opts.get("structure") or "").strip() or None,
        )
        return self._schema_memo

    def reader(self, schema) -> ClickHouseFileReader:
        return ClickHouseFileReader(dict(self.options), schema)


def file_table(
    spark: SparkSession,
    path: str,
    fmt: str = "CSVWithNamesAndTypes",
    structure: Optional[str] = None,
) -> DataFrame:
    """The ``file(path, format[, structure])`` table function as a
    DataFrame — one partition per matched file."""
    from ..plans.base import ensure_session

    ensure_session(spark)
    r = (
        spark.read.format("clickhouse_file")
        .option("path", path)
        .option("format", fmt)
    )
    if structure:
        r = r.option("structure", structure)
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
        ) -> AnalyzeResult:
            if path.value is None:
                raise ValueError(
                    "clickhouse_file(path, fmt[, structure]) requires a "
                    "literal path"
                )
            f = "CSVWithNamesAndTypes" if fmt is None else str(fmt.value)
            st = None if structure is None else str(structure.value)
            paths = expand_file_paths(str(path.value))
            if not paths:
                raise FileNotFoundError(
                    f"clickhouse_file: nothing matches {path.value!r}"
                )
            return AnalyzeResult(schema=_probe_file_schema(paths[0], f, st))

        def eval(
            self,
            path: str,
            fmt: Optional[str] = None,
            structure: Optional[str] = None,
        ) -> Iterator[tuple]:
            f = fmt or "CSVWithNamesAndTypes"
            names = None
            for one in expand_file_paths(path):
                with open(one, "rb") as fh:
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
