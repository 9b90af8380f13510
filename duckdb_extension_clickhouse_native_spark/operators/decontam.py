"""Benchmark decontamination: flag training documents that share
n-token shingles with an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 §C / PaLM / Llama use
8-13-gram overlap): any training doc sharing >= 1 n-gram with a
benchmark doc is flagged (with counts, so callers can threshold).

Scale shape (the property that matters at 100 TB): the benchmark side
is TINY (eval suites are thousands of docs) while the training side is
the whole corpus — so the shingle join broadcasts the benchmark
shingle set and runs map-side against the corpus; the corpus is never
shuffled. Spark picks the broadcast automatically from the size
estimate; `F.broadcast` would pin it. Per-doc counts then aggregate
on doc_id (one shuffle of only the HIT rows, a tiny fraction of the
corpus).

The conformance default is n=3 because the synthetic corpus is
near-random text (8-grams produce zero overlap — a vacuous query);
real corpora use n=8..13 via the ``ngram_n`` parameter.

Both dialects from one template; shingles joined as raw strings
(md5(shingle) is the fixed-width-key variant when shingle strings are
long — same plan shape).
"""

from __future__ import annotations


def decontaminate_sql(dialect: str, ngram_n: int = 3, bench_mod: int = 97) -> str:
    """Per-contaminated-doc report: (doc_id, n_shared_ngrams,
    n_benchmark_docs). Benchmark set = doc_id % bench_mod == 0
    (a deterministic stand-in for a real eval-suite table)."""
    if dialect == "spark":
        tokens = "split(text, ' ')"
        shingles = (
            f"array_distinct(transform(sequence(1, size(toks) - {ngram_n} + 1), "
            f"i -> concat_ws(' ', slice(toks, i, {ngram_n}))))"
        )
        explode = "explode(sh)"
        nlen = "size(toks)"
    else:
        tokens = "string_split(text, ' ')"
        shingles = (
            f"list_distinct(list_transform(range(1, len(toks) - {ngram_n} + 2), "
            f"i -> array_to_string(toks[i:i+{ngram_n}-1], ' ')))"
        )
        explode = "unnest(sh)"
        nlen = "len(toks)"
    return f"""
    WITH docs AS (
      SELECT doc_id, {tokens} AS toks FROM documents
    ),
    shingled AS (
      SELECT doc_id, {shingles} AS sh FROM docs WHERE {nlen} >= {ngram_n}
    ),
    inv AS (SELECT doc_id, {explode} AS shingle FROM shingled),
    bench AS (SELECT doc_id, shingle FROM inv WHERE doc_id % {bench_mod} = 0),
    train AS (SELECT doc_id, shingle FROM inv WHERE doc_id % {bench_mod} <> 0)
    SELECT t.doc_id,
           COUNT(DISTINCT t.shingle) AS n_shared_ngrams,
           COUNT(DISTINCT b.doc_id) AS n_benchmark_docs
    FROM train t JOIN bench b ON t.shingle = b.shingle
    GROUP BY t.doc_id
    """
