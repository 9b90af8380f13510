"""Sequence packing: assign documents to fixed-capacity context
windows (the pre-training batching step — greedy first-fit so short
docs share a window instead of wasting pad tokens).

Packing is inherently sequential (each doc's bin depends on the
running fill), so it cannot be one window expression — but it is
PER-SHARD sequential, which is exactly how production packers run:
shard the corpus (here doc_id % n_shards; at 100 TB, the natural
input partitioning), then greedy-fill within each shard
independently. Spark side: one ``applyInPandas`` per shard — the
driver never sees data, shards pack in parallel, and the per-shard
loop is O(docs-in-shard). Deterministic: docs are packed in doc_id
order within their shard.

Oracle: DuckDB recursive CTE walking each shard's doc sequence and
threading (bin_id, fill) through the recursion — the exact same
first-fit semantics, feasible at oracle scale.

Semantics: a doc opens a new bin when it would overflow ``max_len``;
an oversized doc (n_tokens > max_len) gets its own bin (real packers
truncate or split it — assignment is the same either way).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_LEN = 512
N_SHARDS = 8


def packing_oracle_sql(max_len: int = MAX_LEN, n_shards: int = N_SHARDS) -> str:
    return f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, doc_id % {n_shards} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY doc_id % {n_shards} ORDER BY doc_id) AS rn
      FROM documents
    ),
    walk(shard, rn, doc_id, n_tokens, bin_id, fill) AS (
      SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN w.fill + d.n_tokens > {max_len} THEN w.bin_id + 1 ELSE w.bin_id END,
             CASE WHEN w.fill + d.n_tokens > {max_len} THEN d.n_tokens ELSE w.fill + d.n_tokens END
      FROM walk w JOIN d ON d.shard = w.shard AND d.rn = w.rn + 1
    )
    SELECT doc_id, shard, bin_id, n_tokens FROM walk
    """


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    max_len: int = MAX_LEN,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    from ..plans.base import load_tables

    load_tables(spark, sf_dir, ["documents"])
    docs = spark.table("documents").select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_ids = []
        bin_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill + n > max_len and fill > 0:
                bin_id += 1
                fill = 0
            fill += n
            bin_ids.append(bin_id)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        return pdf[["doc_id", "shard", "bin_id", "n_tokens"]]

    return docs.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, bin_id long, n_tokens long"
    )
