"""Round-2 pipeline operators: connected-components clustering,
decontamination, BM25, stratified sampling, fixed-point k-means.

The oracle sweep (test_queries_oracle) already hash-compares each
against DuckDB; these tests pin the SEMANTICS that the hash can't
express — chaining through the pair graph, exact per-stratum
fractions, k-means partitioning invariants.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401 - populates REGISTRY
from conftest import SF_SMALL
from duckdb_extension_clickhouse_native_spark.operators.components import (
    connected_components,
)
from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY


def test_connected_components_chain(spark, tmp_path):
    """A~B by shared 8-token prefix, B~C by shared token set: all three
    must land in ONE component even though A and C share no key —
    the chaining property plain pair-dedup lacks."""
    texts = [
        "a b c d e f g h z z",  # doc 0: prefix key of doc 1
        "a b c d e f g h x y",  # doc 1
        "y x h g f e d c b a",  # doc 2: token set of doc 1, other prefix
        "q r s t u v w q r s",  # doc 3: unrelated singleton
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in connected_components(spark, str(tmp_path)).collect()
    }
    assert rows[0]["component"] == rows[1]["component"] == rows[2]["component"] == 0
    assert rows[0]["n_members"] == 3
    assert rows[0]["is_kept"] == 1 and rows[1]["is_kept"] == 0
    assert rows[3]["component"] == 3 and rows[3]["n_members"] == 1


def test_stratified_sample_exact_fraction(spark):
    q = REGISTRY.all()["sample_stratified"]
    kept = q.build(spark, SF_SMALL)
    per_stratum = (
        kept.groupBy("lang", "source", "n_stratum")
        .agg(F.count("*").alias("n_kept"))
        .collect()
    )
    assert per_stratum
    for r in per_stratum:
        assert r["n_kept"] == math.ceil(0.1 * r["n_stratum"])


def test_kmeans_partitions_all_vectors(spark):
    q = REGISTRY.all()["kmeans_embeddings"]
    rows = q.build(spark, SF_SMALL).collect()
    n_vecs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert sum(r["n_members"] for r in rows) == n_vecs  # exact partition
    assert len(rows) <= 8 and len({r["cid"] for r in rows}) == len(rows)
    assert all(r["inertia"] >= 0 for r in rows)


def test_decontamination_flags_only_train_docs(spark):
    q = REGISTRY.all()["decontaminate_ngram"]
    rows = q.build(spark, SF_SMALL).collect()
    # benchmark docs must never appear in the contamination report
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    assert all(r["n_shared_ngrams"] >= 1 for r in rows)


def test_bm25_scores_ranked_and_bounded(spark):
    q = REGISTRY.all()["bm25_topk"]
    rows = q.build(spark, SF_SMALL).collect()
    assert rows, "bm25 result must be non-empty"
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_pack_sequences_invariants(spark):
    q = REGISTRY.all()["pack_sequences"]
    df = q.build(spark, SF_SMALL)
    bins = (
        df.groupBy("shard", "bin_id")
        .agg(
            F.sum("n_tokens").alias("fill"),
            F.count("*").alias("n_docs"),
        )
        .collect()
    )
    assert bins
    for r in bins:
        # capacity holds, except a bin holding one oversized doc
        assert r["fill"] <= 512 or r["n_docs"] == 1, r
    # bin ids are contiguous from 0 within each shard
    per_shard = {}
    for r in bins:
        per_shard.setdefault(r["shard"], []).append(r["bin_id"])
    for shard, ids in per_shard.items():
        assert sorted(ids) == list(range(len(ids))), shard
    # packing is greedy in doc_id order: bin_id is monotone in doc_id
    rows = df.orderBy("shard", "doc_id").collect()
    last = {}
    for r in rows:
        assert r["bin_id"] >= last.get(r["shard"], 0)
        last[r["shard"]] = r["bin_id"]


def test_repetition_flags_degenerate_text(spark, tmp_path):
    """A doc that is one phrase repeated must be dropped; varied text
    kept."""
    texts = [
        "spam spam spam spam spam spam spam spam spam spam",
        "the quick brown fox jumps over a lazy sleeping dog",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(2), pa.int64()),
            "text": texts,
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from duckdb_extension_clickhouse_native_spark.functions.text import repetition_sql
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    load_tables(spark, str(tmp_path), ["documents"])
    rows = {r["doc_id"]: r for r in spark.sql(repetition_sql("spark")).collect()}
    assert rows[0]["keep_flag"] == 0 and rows[0]["dup_token_frac"] == 0.9
    assert rows[1]["keep_flag"] == 1 and rows[1]["dup_token_frac"] == 0.0


def test_connected_components_long_chain(spark, tmp_path):
    """Adversarial chain: doc i ~ doc i+1 only (alternating prefix /
    token-set keys), a path graph of 40 docs. Plain propagation would
    need ~40 rounds; the pointer-jump loop must converge inside
    max_iters=10 (~log2) and still produce ONE component."""
    n = 40
    texts = []
    prefix = [f"p0w{j}" for j in range(8)]
    tail_i = 0
    for i in range(n):
        if i == 0:
            toks = prefix + [f"t{tail_i}"]
        elif i % 2 == 1:
            # prefix edge with doc i-1: same first 8 tokens, new tail
            tail_i += 1
            toks = prefix + [f"t{tail_i}"]
        else:
            # token-set edge with doc i-1: same tokens, rotated (new
            # first-8 => no prefix edge), establishing the next prefix
            prev = texts[-1].split(" ")
            toks = prev[::-1]
            prefix = toks[:8]
            # break the set-equality with the NEXT odd doc by adding
            # nothing — the next odd doc reuses this prefix + new tail
        texts.append(" ".join(toks))
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = connected_components(spark, str(tmp_path), max_iters=10).collect()
    comps = {r["component"] for r in rows}
    assert comps == {0}, f"expected one chain component, got {sorted(comps)[:5]}"
    assert all(r["n_members"] == n for r in rows)


def test_semantic_clusters_transitive_over_pairs(spark):
    """Every sign-LSH pair must land in one cluster, and clusters are
    transitive closures (some have >2 members even though LSH pairs
    are binary)."""
    from duckdb_extension_clickhouse_native_spark.operators.components import (
        SEMANTIC_THRESHOLD,
        semantic_clusters,
    )
    from duckdb_extension_clickhouse_native_spark.operators.similarity import (
        signlsh_pairs_sql,
    )

    comp = {
        r["vec_id"]: r["component"]
        for r in semantic_clusters(spark, SF_SMALL).collect()
    }
    pairs = spark.sql(
        signlsh_pairs_sql("spark", threshold=SEMANTIC_THRESHOLD)
    ).collect()
    assert pairs, "threshold must produce pairs at sf0.001"
    for p in pairs:
        assert comp[p["vec_a"]] == comp[p["vec_b"]]
    # exactly one keeper per component
    n_components = len(set(comp.values()))
    kept = sum(1 for v, c in comp.items() if v == c)
    assert kept == n_components


def test_incremental_dedup_statuses(spark):
    q = REGISTRY.all()["dedup_incremental"]
    rows = q.build(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 5 == 0  # only delta docs are reported
        if r["status"] == "near_dup":
            assert r["match_id"] is not None and r["match_id"] % 5 != 0
            assert r["jaccard"] >= 0.5
        else:
            assert r["status"] == "new"
            assert r["match_id"] is None and r["jaccard"] is None


def test_media_phash_pairs_bounds(spark):
    q = REGISTRY.all()["media_phash_pairs"]
    rows = q.build(spark, SF_SMALL).collect()
    for r in rows:
        assert 0 <= r["hamming"] <= 12
        assert r["doc_a"] < r["doc_b"]
    # pairs are unique
    assert len({(r["doc_a"], r["doc_b"]) for r in rows}) == len(rows)


def test_pii_scrub_redacts_and_counts(spark, tmp_path):
    """Real PII in the text body is counted and replaced with typed
    placeholders; clean text is untouched (fp = md5 of original)."""
    texts = [
        "reach me at alice.smith+x@corp.example.org today",
        "server 192.168.1.250 answered (415) 555-0042 and 650-555-0199",
        "no personal data here at all",
    ]
    t = pa.table(
        {
            "doc_id": pa.array([1, 7, 11], pa.int64()),  # avoid overlay mods
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from duckdb_extension_clickhouse_native_spark.functions.text import pii_scrub_sql
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    load_tables(spark, str(tmp_path), ["documents"])
    rows = {r["doc_id"]: r for r in spark.sql(pii_scrub_sql("spark")).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ips"]) == (1, 0, 0)
    assert (rows[7]["n_emails"], rows[7]["n_phones"], rows[7]["n_ips"]) == (0, 2, 1)
    assert (rows[11]["n_emails"], rows[11]["n_phones"], rows[11]["n_ips"]) == (0, 0, 0)
    import hashlib

    # doc 11 hits no overlay branch (11%3,%4 in {3,2}... 11%4=3, 11%3=2,
    # 11%5=1) and has no PII: redaction must be the identity
    assert rows[11]["redacted_fp"] == hashlib.md5(texts[2].encode()).hexdigest()
    # doc 7 (7%4=3, 7%3=1, 7%5=2): both phone shapes + the IP redacted
    expected7 = "server <IP> answered <PHONE> and <PHONE>"
    assert rows[7]["redacted_fp"] == hashlib.md5(expected7.encode()).hexdigest()
    assert rows[7]["redacted_len"] == len(expected7)


def test_mixture_sample_temperature_flattens(spark, tmp_path):
    """T=0.5 upweights small sources: a 9x token imbalance must yield
    only a 3x quota imbalance (sqrt), and quotas respect source size."""
    rows = []
    for i in range(90):
        rows.append((i, "tok " * 10, "en", "big", 40))
    for i in range(90, 100):
        rows.append((i, "tok " * 10, "en", "small", 40))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1].strip() for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from duckdb_extension_clickhouse_native_spark.operators.retrieval import (
        mixture_sample_sql,
    )
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    load_tables(spark, str(tmp_path), ["documents"])
    out = spark.sql(mixture_sample_sql("spark")).collect()
    quotas = {}
    for r in out:
        quotas[r["source"]] = r["quota"]
    # natural proportions are 90:10; sqrt-temperature gives 3:1
    assert quotas["big"] == 3 * quotas["small"]
    # per-source picks == quota, and every pick is a real doc of that source
    from collections import Counter

    picks = Counter(r["source"] for r in out)
    assert picks["big"] == quotas["big"] and picks["small"] == quotas["small"]


def test_pq_codebook_members_self_encode(spark):
    """Each of the first k_sub vectors IS a codebook entry in every
    subspace, so its argmin distance is 0 and its packed base-32 code
    is vec_id * sum(32^m for m in 0..7)."""
    from duckdb_extension_clickhouse_native_spark.operators.similarity import pq_topk_sql
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    load_tables(spark, "/root/testdata/sf0.001", ["embeddings"])
    # widen the top-k so codebook members show up in the result
    rows = spark.sql(pq_topk_sql("spark", k=500)).collect()
    got = {r["vec_id"]: r["pq_code"] for r in rows if r["vec_id"] < 32}
    assert len(got) >= 20  # most codebook members are present somewhere
    unit = sum(32**m for m in range(8))
    for vid, code in got.items():
        assert code == vid * unit, (vid, code)


def test_shard_writer_exact_sizes_and_order(spark, tmp_path):
    """Shards are exact-size (remainder in the last), cover every doc
    once, and rows within a shard are hash-ordered (grank ascending)."""
    from duckdb_extension_clickhouse_native_spark.operators.sharding import (
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    write_training_shards(spark, "/root/testdata/sf0.001", out, shard_docs=16)
    back = spark.read.parquet(out)
    n = back.count()
    sizes = {r[0]: r[1] for r in back.groupBy("shard_id").count().collect()}
    last = max(sizes)
    for sid, c in sizes.items():
        assert c == 16 or (sid == last and c == n - 16 * last)
    assert back.select("doc_id").distinct().count() == n
    # within-shard order: granks in shard 0 are 0..15 and contiguous
    g0 = [r[0] for r in back.filter("shard_id = 0").select("grank").collect()]
    assert sorted(g0) == list(range(16))


def test_shard_two_phase_equals_naive(spark):
    """The distributed two-phase rank and the naive global window
    produce identical shard summaries (Spark vs Spark, shard size 32)."""
    from duckdb_extension_clickhouse_native_spark.operators.sharding import (
        shard_assign_sql,
    )
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    load_tables(spark, "/root/testdata/sf0.001", ["documents"])
    two = spark.sql(shard_assign_sql("spark", shard_docs=32, two_phase=True))
    naive = spark.sql(shard_assign_sql("spark", shard_docs=32, two_phase=False))
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, naive.collect()))


def test_chunking_covers_and_reconstructs(spark, tmp_path):
    """Chunks tile the doc with exact 50-char overlap: stripping the
    overlap from every chunk after the first reconstructs the text."""
    text = "x" * 120 + "y" * 200 + "z" * 80  # 400 chars -> 3 chunks
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": [text],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": pa.array([len(text)], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from duckdb_extension_clickhouse_native_spark.functions.text import chunk_sql
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    load_tables(spark, str(tmp_path), ["documents"])
    rows = sorted(
        spark.sql(chunk_sql("spark")).collect(), key=lambda r: r["chunk_id"]
    )
    assert [r["chunk_start"] for r in rows] == [1, 151, 301]
    assert [r["chunk_len"] for r in rows] == [200, 200, 100]
    # verify reconstruction against the raw substrings
    rebuilt = text[0:200] + text[200:350] + text[350:400]
    assert rebuilt == text
    import hashlib

    assert rows[0]["chunk_fp"] == hashlib.md5(text[0:200].encode()).hexdigest()
    assert rows[1]["chunk_fp"] == hashlib.md5(text[150:350].encode()).hexdigest()
    assert rows[2]["chunk_fp"] == hashlib.md5(text[300:400].encode()).hexdigest()


def test_zorder_tiles_both_dimensions(spark):
    """Every z-file's envelope must be a strict sub-range of BOTH key
    domains on average — the property a single-key sort cannot have
    (its secondary dimension spans the whole domain in every file)."""
    from duckdb_extension_clickhouse_native_spark.operators.zorder import (
        zorder_layout_sql,
    )
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    load_tables(spark, "/root/testdata/sf0.01", ["events"])
    rows = spark.sql(zorder_layout_sql("spark")).collect()
    assert len(rows) >= 4
    user_span = max(r["max_user"] for r in rows) - min(r["min_user"] for r in rows)
    bucket_span = max(r["max_bucket"] for r in rows) - min(r["min_bucket"] for r in rows)
    avg_user_env = sum(r["max_user"] - r["min_user"] for r in rows) / len(rows)
    avg_bucket_env = sum(r["max_bucket"] - r["min_bucket"] for r in rows) / len(rows)
    # each file covers well under half of each dimension on average
    assert avg_user_env < 0.5 * user_span
    assert avg_bucket_env < 0.5 * bucket_span
    # z-ranges of files are disjoint (files are z-contiguous)
    spans = sorted((r["min_z"], r["max_z"]) for r in rows)
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b < c
