"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode libraries (PIL/torchaudio/ffmpeg) are not in this
container, so the actual byte->pixels step is STUBBED behind
``decode_image_stub`` (a deterministic fake) — but everything
Spark-side is real: the binary schema, the mapInPandas batch
iteration, the output schema contract, and the partition-parallel
execution. Swap the stub for a real decoder and nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, media_type string, "
    "byte_len bigint, header_hex string, checksum_mod bigint"
)


def decode_image_stub(data: bytes) -> dict:
    """Deterministic fake 'decode': real decoders return
    (width, height, channels, pixels); this returns stand-ins derived
    from the bytes so the pipeline shape is testable offline.

    Raises ``NotImplementedError`` when a real decode is requested.
    """
    if not isinstance(data, (bytes, bytearray)):
        raise TypeError("media column must be binary")
    return {
        "byte_len": len(data),
        "header_hex": data[:4].hex(),
        "checksum_mod": sum(data) % 1_000_003,
    }


def real_decode(data: bytes):  # pragma: no cover - documented stub
    raise NotImplementedError(
        "image/audio decode libraries are not available in this environment; "
        "plug PIL.Image.open / soundfile.read here"
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: documents' text bytes standing in for
    encoded media payloads (opaque binary + typed metadata)."""
    from ..plans.base import ensure_session

    ensure_session(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.lit("fake/utf8").alias("media_type"),
    )


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow-batched: each pandas batch holds ~10k binary cells; the
    stub decoder runs per cell; output is a typed feature frame. At
    100 TB this is a map-only stage — featurework parallelism equals
    input partitions, no shuffle.
    """
    import pandas as pd

    def features(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = pdf["media"].map(decode_image_stub)
            out = pdf[["doc_id", "media", "media_type"]].copy()
            out["byte_len"] = [f["byte_len"] for f in feats]
            out["header_hex"] = [f["header_hex"] for f in feats]
            out["checksum_mod"] = [f["checksum_mod"] for f in feats]
            yield out

    return df.mapInPandas(features, schema=MEDIA_SCHEMA)


def media_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance entry: byte-level features through the mapInPandas
    path, reduced to an oracle-checkable projection."""
    return extract_media_features(media_table(spark, sf_dir)).select(
        "doc_id", "byte_len", "header_hex", "checksum_mod"
    )


# the synthetic documents are pure ASCII (verified: max codepoint 121),
# so per-byte arithmetic can use ascii() on chars; a real binary column
# would need a blob-capable oracle
MEDIA_FEATURES_ORACLE_SQL = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
           CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1),
                i -> ascii(substr(text, i, 1)))), 0) AS BIGINT) % 1000003 AS checksum_mod
    FROM documents
"""
