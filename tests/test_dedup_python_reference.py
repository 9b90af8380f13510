"""Independent-oracle hardening for the dedup families (VERDICT r8 #3).

The MinHash/SimHash/n-gram-Jaccard queries emit BOTH dialects from one
template, so the driver's Spark-vs-DuckDB hash check proves parity,
not semantics — a bug in the shared template reproduces identically on
both sides. These tests pin the DuckDB oracle SQL against PLAIN-PYTHON
reference implementations (structurally unrelated: dict/set/md5, no
SQL) on hypothesis-generated corpora, following the
``events_sequence_count`` precedent. With the Python reference
agreeing with the oracle, and the driver proving Spark == oracle, the
Spark production path is pinned transitively.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.operators import dedup

# small vocabulary so random docs actually share tokens/shingles
WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far", "x", ""]

doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=10)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=8)


def _texts(corpus: list[list[str]]) -> list[str]:
    return [" ".join(words) for words in corpus]


def _con(texts: list[str]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    return con


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _tokens(text: str) -> list[str]:
    # exactly DuckDB string_split / Spark split semantics (verified:
    # '' -> [''], 'a  b ' -> ['a','','b',''])
    return text.split(" ")


def _shingles(toks: list[str]) -> list[str]:
    if len(toks) >= 3:
        return [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
    return [" ".join(toks)]


# -- MinHash + LSH ----------------------------------------------------------


def ref_minhash_pairs(
    texts: list[str],
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = dedup.MINHASH_DEFAULT_THRESHOLD,
) -> set[tuple[int, int, float]]:
    a_co, b_co = dedup._mh_coeffs(n_hashes)
    rows = n_hashes // bands
    toks_d, band_rows = {}, {}
    for doc_id, text in enumerate(texts):
        toks = _tokens(text)
        toks_d[doc_id] = set(toks)
        sh = set(_shingles(toks))
        h30s = [int(_md5(s)[:7], 16) for s in sh]
        sig = [
            min((a_co[i] * h + b_co[i]) % dedup.MINHASH_PRIME for h in h30s)
            for i in range(n_hashes)
        ]
        band_rows[doc_id] = [
            _md5("|".join(str(sig[b * rows + r]) for r in range(rows)))
            for b in range(bands)
        ]
    out = set()
    for da, db in combinations(range(len(texts)), 2):
        if any(band_rows[da][b] == band_rows[db][b] for b in range(bands)):
            inter = len(toks_d[da] & toks_d[db])
            union = len(toks_d[da]) + len(toks_d[db]) - inter
            j = inter / union
            if j >= threshold:
                out.add((da, db, j))
    return out


@settings(max_examples=60, deadline=None)
@given(corpus_strategy)
def test_minhash_oracle_matches_python_reference(corpus):
    texts = _texts(corpus)
    got = {
        (a, b, j)
        for a, b, j in _con(texts)
        .execute(dedup.minhash_lsh_sql("duckdb"))
        .fetchall()
    }
    assert got == ref_minhash_pairs(texts)


# -- SimHash ----------------------------------------------------------------


def ref_simhash_pairs(
    texts: list[str], hamming_max: int = 3
) -> set[tuple[int, int, int]]:
    sigs = {}
    for doc_id, text in enumerate(texts):
        toks = set(_tokens(text))
        votes_lo, votes_hi = [0] * 32, [0] * 32
        for t in toks:
            h = _md5(t)
            h_lo, h_hi = int(h[:8], 16), int(h[8:16], 16)
            for j in range(32):
                votes_lo[j] += 1 if (h_lo >> j) & 1 else -1
                votes_hi[j] += 1 if (h_hi >> j) & 1 else -1
        sim_lo = sum(1 << j for j in range(32) if votes_lo[j] > 0)
        sim_hi = sum(1 << j for j in range(32) if votes_hi[j] > 0)
        bands = (
            sim_lo & 0xFFFF,
            (sim_lo >> 16) & 0xFFFF,
            sim_hi & 0xFFFF,
            (sim_hi >> 16) & 0xFFFF,
        )
        sigs[doc_id] = (sim_lo, sim_hi, bands)
    out = set()
    for da, db in combinations(range(len(texts)), 2):
        lo_a, hi_a, ba = sigs[da]
        lo_b, hi_b, bb = sigs[db]
        if any(ba[i] == bb[i] for i in range(4)):
            ham = bin(lo_a ^ lo_b).count("1") + bin(hi_a ^ hi_b).count("1")
            if ham <= hamming_max:
                out.add((da, db, ham))
    return out


@settings(max_examples=60, deadline=None)
@given(corpus_strategy)
def test_simhash_oracle_matches_python_reference(corpus):
    texts = _texts(corpus)
    got = {
        (a, b, h)
        for a, b, h in _con(texts).execute(dedup.simhash_sql("duckdb")).fetchall()
    }
    assert got == ref_simhash_pairs(texts)


# -- n-gram Jaccard ---------------------------------------------------------


def ref_ngram_pairs(
    texts: list[str], threshold: float = 0.5, max_df: int = 20
) -> set[tuple[int, int, float]]:
    sh_d = {i: set(_shingles(_tokens(t))) for i, t in enumerate(texts)}
    df = {}
    for shs in sh_d.values():
        for s in shs:
            df[s] = df.get(s, 0) + 1
    kept = {i: {s for s in shs if df[s] <= max_df} for i, shs in sh_d.items()}
    out = set()
    for da, db in combinations(kept, 2):
        inter = len(kept[da] & kept[db])
        if inter == 0:
            continue  # no shared index rows -> pair never forms
        j = inter / (len(kept[da]) + len(kept[db]) - inter)
        if j >= threshold:
            out.add((da, db, j))
    return out


@settings(max_examples=60, deadline=None)
@given(corpus_strategy)
def test_ngram_jaccard_oracle_matches_python_reference(corpus):
    # low max_df exercises the df-cap path on tiny corpora
    texts = _texts(corpus)
    got = {
        (a, b, j)
        for a, b, j in _con(texts)
        .execute(dedup.ngram_jaccard_sql("duckdb", max_df=3))
        .fetchall()
    }
    assert got == ref_ngram_pairs(texts, max_df=3)


# -- fixed hostile corpus through SPARK (third anchor) ----------------------


def test_minhash_spark_matches_python_reference(spark, tmp_path):
    """One direct Spark-vs-Python check (no DuckDB in the loop) on a
    corpus with exact dups, near-dups, short docs, and empty text."""
    texts = [
        "the cat sat on the mat today",
        "the cat sat on the mat today",       # exact dup of 0
        "the cat sat on the mat yesterday",   # near dup
        "a completely different document here",
        "short",
        "",
        "the cat sat",                        # 3 tokens = 1 shingle path
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).write.parquet(d + "/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.minhash_lsh_query(spark, d).collect()
    }
    exp = ref_minhash_pairs(texts)
    assert {(a, b) for a, b, _ in got} == {(a, b) for a, b, _ in exp}
    assert got == exp
    assert (0, 1, 1.0) in got  # the exact dup must be found
