"""Training-shard assignment: deterministic global shuffle + exact
size-bounded shards, computed with a two-phase distributed rank.

The last step of a training-data pipeline: order the corpus by a hash
(a reproducible "global shuffle"), cut it into fixed-size shards, and
write one file per shard. The naive SQL — ``ROW_NUMBER() OVER (ORDER
BY md5(id))`` — funnels the whole corpus through ONE reducer: correct
at conformance scale, dead at 100 TB.

The two-phase form here is the scale-correct shape:

1. bucket each row by its hash prefix (256 ordered buckets — each a
   separate window partition, so ranking is distributed);
2. rank locally within the bucket;
3. compute bucket offsets from per-bucket counts (a 256-row aggregate
   — the only global step, and it is tiny);
4. global rank = bucket offset + local rank; shard = rank DIV size.

Every stage is keyed on the bucket (or the doc), nothing is single-
reducer, and the result is bit-identical to the naive form — which is
exactly what the DuckDB oracle runs, so the conformance check proves
the two-phase decomposition correct.

``write_training_shards`` materializes the assignment: one directory
per shard, rows hash-ordered within each shard file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def shard_assign_sql(dialect: str, shard_docs: int = 64, two_phase: bool = True) -> str:
    """Per-shard summary (shard_id, n_docs, n_tokens, min/max doc) of
    the deterministic shard assignment. ``two_phase=False`` gives the
    naive single-window form (used as the DuckDB oracle — same result,
    simpler plan for an engine that needn't scale out here)."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    idiv = "DIV" if dialect == "spark" else "//"
    ntok = (
        "size(split(text, ' '))" if dialect == "spark" else "len(string_split(text, ' '))"
    )
    if two_phase:
        ranked = f"""
    keyed AS (
      SELECT doc_id, CAST({ntok} AS BIGINT) AS n_tok,
             md5(CAST(doc_id AS {s})) AS k
      FROM documents
    ),
    bucketed AS (SELECT doc_id, n_tok, k, substring(k, 1, 2) AS b FROM keyed),
    local_rank AS (
      SELECT doc_id, n_tok, b,
             ROW_NUMBER() OVER (PARTITION BY b ORDER BY k, doc_id) AS lrn
      FROM bucketed
    ),
    bucket_sizes AS (SELECT b, COUNT(*) AS n FROM bucketed GROUP BY b),
    bucket_offsets AS (
      SELECT b, COALESCE(SUM(n) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM bucket_sizes
    ),
    ranked AS (
      SELECT l.doc_id, l.n_tok, o.off + l.lrn - 1 AS grank
      FROM local_rank l JOIN bucket_offsets o ON l.b = o.b
    )"""
    else:
        ranked = f"""
    keyed AS (
      SELECT doc_id, CAST({ntok} AS BIGINT) AS n_tok,
             md5(CAST(doc_id AS {s})) AS k
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tok,
             ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS grank
      FROM keyed
    )"""
    return f"""
    WITH {ranked}
    SELECT CAST(grank {idiv} {shard_docs} AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM ranked
    GROUP BY grank {idiv} {shard_docs}
    """


def write_training_shards(
    spark: SparkSession, sf_dir: str, out_dir: str, shard_docs: int = 64
) -> DataFrame:
    """Materialize the assignment: parquet partitioned by shard_id,
    rows hash-ordered within each shard. Returns the assigned frame.

    At scale the write is one shuffle (repartition on shard_id) and a
    local sort per shard — no global sort anywhere.
    """
    from pyspark.sql import functions as F

    from ..plans.base import ensure_session, load_tables

    ensure_session(spark)
    load_tables(spark, sf_dir, ["documents"])
    # reuse the two-phase ranked CTE by asking for 1-doc shards, then
    # regroup: shard_id of a row with grank g is g DIV shard_docs, and
    # n_docs==1 rows carry min_doc==doc_id
    per_doc = spark.sql(shard_assign_sql("spark", shard_docs=1, two_phase=True))
    assigned = per_doc.select(
        (F.col("shard_id") / shard_docs).cast("long").alias("shard_id"),
        F.col("shard_id").alias("grank"),
        F.col("min_doc").alias("doc_id"),
        F.col("n_tokens"),
    )
    (
        assigned.repartition("shard_id")
        .sortWithinPartitions("grank")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    return assigned
