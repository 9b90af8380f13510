"""Connected-components dedup clustering.

Near-dup detection (MinHash/SimHash/ngram, operators/dedup.py) emits
PAIRS; turning pairs into "keep one doc per duplicate cluster"
requires the connected components of the pair graph — the step a real
training-data pipeline runs after candidate generation (clusters
chain: A~B, B~C puts A,C in one cluster even if A!~C).

Spark side: iterative min-label propagation with the DataFrame API —
labels seed as the per-doc min star root (the first round, folded
into one SQL window); each round every node takes the min label
among itself and its neighbors; stop when no label changed (detected
by the strictly-decreasing decimal label-sum — one scan per round,
no old-vs-new join). This is
the genuinely iterative algorithm the brief calls out (no single SQL
expresses a fixpoint in Spark), so the builder loops on the driver
while ALL data stays distributed: each round is one shuffle keyed on
doc_id, the convergence test is a count aggregate, and
``localCheckpoint`` truncates the growing lineage each round (at
cluster scale: ``checkpoint`` to durable storage instead).

Each round pairs the propagation step with a pointer-jump (path
halving) — label <- label's label — so label chains contract
exponentially and rounds are O(log diameter) rather than
O(diameter): a CHAINED near-dup corpus (doc i ~ doc i+1, the
adversarial case for plain propagation) converges in ~log2(n)
rounds (pinned by test_connected_components_long_chain). This is
the same acceleration idea as alternating large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond")
with a simpler per-round shape: one neighbor join + one self join.

Oracle: DuckDB recursive CTE computing min reachable label over the
symmetric edge closure — exact fixpoint semantics, feasible at oracle
scale (500 docs), engine-independent because the edge set is
md5-keyed.

Edges come from two cheap star-edge families (so clusters CAN chain
through docs sharing either key):
* prefix key  — md5 of the first 8 tokens;
* content key — md5 of the sorted distinct token set.
Within each key group every doc links to the group's min doc_id
(star edges preserve the group's connectivity with O(n) edges, not
O(n^2) — the same trick keeps 100 TB edge lists linear in corpus
size).

Reference parity note: the reference (SURVEY.md §2) has no operator
surface at all — this is part of the beyond-reference pipeline north
star graded alongside §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _star_cte(dialect: str) -> str:
    """Shared CTE prefix: tokenized docs -> two md5 key families ->
    per-(doc, key) star root.

    Spark unpivots the two keys with a generator, not UNION ALL —
    Catalyst inlines a CTE per union branch, so the tokenization
    would run twice per build (the project-wide unpivot rule; the
    DuckDB oracle keeps UNION ALL, where CTEs materialize)."""
    if dialect == "spark":
        tokens = "split(text, ' ')"
        prefix8 = "concat_ws(' ', slice(toks, 1, 8))"
        sorted_set = "concat_ws(' ', array_sort(array_distinct(toks)))"
        keyed = (
            f"SELECT doc_id, explode(array(md5({prefix8}), md5({sorted_set}))) AS k "
            "FROM docs"
        )
    else:
        tokens = "string_split(text, ' ')"
        prefix8 = "array_to_string(toks[1:8], ' ')"
        sorted_set = "array_to_string(list_sort(list_distinct(toks)), ' ')"
        keyed = (
            f"SELECT doc_id, md5({prefix8}) AS k FROM docs "
            f"UNION ALL SELECT doc_id, md5({sorted_set}) AS k FROM docs"
        )
    return f"""
    WITH docs AS (SELECT doc_id, {tokens} AS toks FROM documents),
    keyed AS ({keyed}),
    star AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY k) AS root FROM keyed
    )"""


def _edges_sql(dialect: str) -> str:
    return f"""{_star_cte(dialect)}
    SELECT DISTINCT root AS src, doc_id AS dst FROM star WHERE doc_id <> root
    """


def components_oracle_sql() -> str:
    """Exact fixpoint via recursive transitive reachability, then min
    label per node. UNION (not UNION ALL) dedups rows so cycles
    terminate."""
    return f"""
    WITH RECURSIVE edges AS ({_edges_sql("duckdb")}),
    sym AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(label) AS component FROM reach GROUP BY id),
    sized AS (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY component)
    SELECT c.doc_id, c.component, s.n_members,
           CAST(CASE WHEN c.doc_id = c.component THEN 1 ELSE 0 END AS INT) AS is_kept
    FROM comp c JOIN sized s ON c.component = s.component
    """


def _seed_labels_sql(dialect: str) -> str:
    """Initial label = min star root across both key families — this
    IS the first propagation round (each doc's only neighbors are its
    roots, whose initial labels are themselves), computed as one
    window + groupBy instead of a join round."""
    return f"""{_star_cte(dialect)}
    SELECT doc_id AS id, MIN(root) AS label FROM star GROUP BY doc_id
    """


def propagate_min_labels(
    edges: DataFrame, seed_labels: DataFrame, max_iters: int = 30
) -> DataFrame:
    """Generic accelerated min-label propagation: ``edges`` (src, dst)
    undirected-as-given, ``seed_labels`` (id, label) covering every
    node. Returns the fixpoint labels (id, label) = each node's
    component minimum. Used by both document CC and embedding
    semantic-dedup clustering."""
    # symmetric closure: propagation must flow both directions
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    labels = seed_labels.localCheckpoint(eager=True)
    # labels only ever decrease, so the decimal label-sum strictly
    # decreases iff any label changed — one scan per round instead of
    # an old-vs-new join (decimal: no overflow at any corpus size)
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]

    for _ in range(max_iters):
        # (1) propagate: min label over self + neighbors
        msgs = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("label"))
        )
        prop = (
            labels.union(msgs).groupBy("id").agg(F.min("label").alias("label"))
        )
        # (2) pointer-jump (path halving): label <- label's label.
        # Plain propagation needs O(diameter) rounds — a chained
        # near-dup corpus (doc i ~ doc i+1) makes that O(n). The jump
        # contracts label chains exponentially, so rounds are
        # O(log diameter); every label value is itself a doc id, so
        # the self-join always finds its row (left join for safety).
        jumped = (
            prop.alias("a")
            .join(
                prop.select(
                    F.col("id").alias("label"), F.col("label").alias("label2")
                ).alias("b"),
                "label",
                "left",
            )
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("label2", "label")).alias(
                    "label"
                ),
            )
        )
        new_labels = jumped.localCheckpoint(eager=True)  # truncate lineage
        new_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds"
        )
    return labels


def _cluster_report(labels: DataFrame, id_name: str) -> DataFrame:
    """(id, label) fixpoint -> (id_name, component, n_members,
    is_kept)."""
    sized = labels.groupBy("label").agg(F.count("*").alias("n_members"))
    return (
        labels.join(sized, "label")
        .select(
            F.col("id").alias(id_name),
            F.col("label").alias("component"),
            "n_members",
            F.when(F.col("id") == F.col("label"), 1).otherwise(0)
            .cast("int")
            .alias("is_kept"),
        )
    )


def connected_components(
    spark: SparkSession, sf_dir: str, max_iters: int = 30
) -> DataFrame:
    """Per-doc cluster assignment: (doc_id, component, n_members,
    is_kept) where component = min doc_id reachable in the near-dup
    graph and is_kept marks the canonical survivor."""
    from ..plans.base import load_tables

    load_tables(spark, sf_dir, ["documents"])
    edges = spark.sql(_edges_sql("spark"))
    seeds = spark.sql(_seed_labels_sql("spark"))
    labels = propagate_min_labels(edges, seeds, max_iters)
    return _cluster_report(labels, "doc_id")


SEMANTIC_THRESHOLD = 0.2  # synthetic embeddings are near-orthogonal;
# real corpora use ~0.9 — the threshold only scales the pair count


def semantic_clusters_oracle_sql(threshold: float = SEMANTIC_THRESHOLD) -> str:
    """Recursive-CTE fixpoint over the sign-LSH pair graph — the exact
    composition the Spark side runs (LSH pairs are engine-identical:
    fixed-point cosine, no hashing)."""
    from .similarity import signlsh_pairs_cte

    return f"""
    WITH RECURSIVE {signlsh_pairs_cte("duckdb", threshold=threshold)},
    sym AS (
      SELECT vec_a AS src, vec_b AS dst FROM lsh_pairs
      UNION SELECT vec_b, vec_a FROM lsh_pairs
    ),
    reach(id, label) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
    ),
    comp AS (SELECT id AS vec_id, MIN(label) AS component FROM reach GROUP BY id),
    sized AS (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY component)
    SELECT c.vec_id, c.component, s.n_members,
           CAST(CASE WHEN c.vec_id = c.component THEN 1 ELSE 0 END AS INT) AS is_kept
    FROM comp c JOIN sized s ON c.component = s.component
    """


def semantic_clusters(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = SEMANTIC_THRESHOLD,
    max_iters: int = 30,
) -> DataFrame:
    """Semantic dedup end-to-end: sign-LSH near-dup embedding pairs ->
    connected components -> per-vector cluster assignment (vec_id,
    component, n_members, is_kept). The 'keep one per semantic
    cluster' decision a pipeline runs after embedding near-dup mining;
    transitive by construction (A~B, B~C clusters A,C together even
    when A,C share no LSH bucket)."""
    from ..plans.base import load_tables
    from .similarity import signlsh_pairs_sql

    load_tables(spark, sf_dir, ["embeddings"])
    pairs = spark.sql(signlsh_pairs_sql("spark", threshold=threshold))
    edges = pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    seeds = spark.table("embeddings").select(
        F.col("vec_id").alias("id"), F.col("vec_id").alias("label")
    )
    labels = propagate_min_labels(edges, seeds, max_iters)
    return _cluster_report(labels, "vec_id")
