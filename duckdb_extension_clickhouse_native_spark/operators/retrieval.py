"""Corpus retrieval scoring: BM25 ranking and stratified sampling.

BM25 is the standard lexical relevance score a data pipeline uses for
query-driven corpus selection ("find docs about X to upsample").
Shape at scale: token explode -> tf per (doc, term) with the term
filter applied BEFORE the shuffle (only rows matching query terms
survive the map side); df and the corpus stats are tiny aggregates
broadcast back; final score is one shuffle keyed on doc_id over hit
rows only. The corpus is never shuffled whole.

Float parity: tf/df/doclen are exact integers in both engines; avgdl
is an exact integer sum divided once; the only transcendental is
ln(), so the final score is rounded to 6 digits (same double except
on a ~1e-9-probability rounding boundary — the same rule as
cosine_topk_fast's shared oracle).

Stratified sampling: exact fraction per (lang, source) stratum via a
deterministic md5 rank — the per-group analogue of the global
hash-sample (plans/advanced.py). One window shuffle keyed on the
stratum; no randomness, so both engines keep identical rows.
"""

from __future__ import annotations

DEFAULT_TERMS = ("vector", "hash", "window", "stream")


def bm25_sql(
    dialect: str,
    terms: tuple[str, ...] = DEFAULT_TERMS,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """Top-k docs by BM25 over ``terms`` (IDF per Robertson-Sparck
    Jones with the +1 floor, as in Lucene)."""
    if dialect == "spark":
        explode = "SELECT doc_id, explode(split(text, ' ')) AS token FROM documents"
        dl = "size(split(text, ' '))"
    else:
        explode = "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
        dl = "len(string_split(text, ' '))"
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH inv AS ({explode}),
    hits AS (SELECT doc_id, token FROM inv WHERE token IN ({term_list})),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM hits GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY token),
    doclen AS (SELECT doc_id, {dl} AS dl FROM documents),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM doclen
    ),
    scored AS (
      SELECT t.doc_id,
             SUM(
               ln((CAST(s.n_docs - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
               * (CAST(t.tf AS DOUBLE) * ({k1} + 1.0))
               / (CAST(t.tf AS DOUBLE) + {k1} * (1.0 - {b} + {b} * CAST(l.dl AS DOUBLE) / s.avgdl))
             ) AS score
      FROM tf t
      JOIN df d ON t.token = d.token
      JOIN doclen l ON t.doc_id = l.doc_id
      CROSS JOIN stats s
      GROUP BY t.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT {top_k}
    """


def stratified_sample_sql(dialect: str, fraction: float = 0.1) -> str:
    """Deterministic ``fraction`` sample per (lang, source) stratum:
    rank by md5(doc_id) inside the stratum, keep ceil(fraction * n)."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS {s})), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang, source) AS n_stratum
      FROM documents
    )
    SELECT lang, source, doc_id, n_stratum
    FROM ranked
    WHERE rn <= CAST(ceil({fraction} * n_stratum) AS BIGINT)
    """


def mixture_sample_sql(dialect: str, target_pct: int = 40) -> str:
    """Temperature-weighted mixture sampling across sources (the data-
    mixing step of a training pipeline): each source gets a quota
    proportional to ``tokens_s ** 0.5`` (temperature T=0.5 flattens the
    natural size distribution, upweighting small sources), then picks
    its quota deterministically by md5 rank.

    Engine parity is by exact integer arithmetic end-to-end: sqrt() is
    IEEE-correctly-rounded (identical doubles per value in both
    engines), each weight is floored to integer micro-units so the
    cross-source SUM is a BIGINT (order-independent — a double SUM(w)
    would round differently under each engine's summation order), and
    quotas use integer division on ``target_pct`` as a rational.

    Scale shape: source stats are one tiny agg (|sources| rows,
    broadcast back), ranking is one window shuffle keyed on source —
    salt heavy sources at 100 TB if a single source dominates.
    """
    s = "STRING" if dialect == "spark" else "VARCHAR"
    idiv = "DIV" if dialect == "spark" else "//"
    ntok = (
        "size(split(text, ' '))" if dialect == "spark" else "len(string_split(text, ' '))"
    )
    return f"""
    WITH src_stats AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(CAST({ntok} AS BIGINT)) AS n_tok
      FROM documents GROUP BY source
    ),
    weights AS (
      SELECT source, n_docs,
             CAST(FLOOR(sqrt(CAST(n_tok AS DOUBLE)) * 1000000) AS BIGINT) AS w
      FROM src_stats
    ),
    totals AS (SELECT SUM(w) AS sum_w, SUM(n_docs) AS n_total FROM weights),
    quotas AS (
      SELECT w.source, w.n_docs,
             CAST(LEAST(w.n_docs, GREATEST(CAST(1 AS BIGINT),
               ({target_pct} * t.n_total * w.w) {idiv} (100 * t.sum_w))) AS BIGINT) AS quota
      FROM weights w CROSS JOIN totals t
    ),
    ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS {s})), doc_id) AS rn
      FROM documents
    )
    SELECT r.source, r.doc_id, q.quota
    FROM ranked r JOIN quotas q ON r.source = q.source
    WHERE r.rn <= q.quota
    """


def hybrid_rrf_sql(dialect: str, k_each: int = 20, k: int = 10, rrf_k: int = 60) -> str:
    """Hybrid retrieval: fuse the lexical BM25 ranking and the exact
    semantic (cosine) ranking with Reciprocal Rank Fusion —
    ``score(d) = sum over lists of 1/(rrf_k + rank_d)`` — the standard
    way a pipeline combines keyword and embedding retrieval without
    score calibration.

    Ranks are deterministic integers (both lists tie-break on doc id),
    each reciprocal is one double division, and the fused score adds at
    most two doubles — so the result is engine-identical with no
    rounding tricks. The doc_id == vec_id correspondence of the test
    corpus links the two modalities. At scale both branches end in
    top-``k_each`` (TakeOrderedAndProject), so the fusion join touches
    at most ``2 * k_each`` rows regardless of corpus size.
    """
    from .similarity import cosine_topk_sql

    lex = bm25_sql(dialect, top_k=k_each)
    sem = cosine_topk_sql(dialect, k=k_each)
    return f"""
    WITH lex AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM ({lex}) b
    ),
    sem AS (
      SELECT vec_id AS doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS r
      FROM ({sem}) c
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             COALESCE(CAST(1 AS DOUBLE) / ({rrf_k} + l.r), CAST(0 AS DOUBLE))
               + COALESCE(CAST(1 AS DOUBLE) / ({rrf_k} + s.r), CAST(0 AS DOUBLE)) AS rrf,
             l.r AS lex_rank, s.r AS sem_rank
      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, ROUND(rrf, 9) AS rrf_score,
           CAST(COALESCE(lex_rank, 0) AS INT) AS lex_rank,
           CAST(COALESCE(sem_rank, 0) AS INT) AS sem_rank
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {k}
    """


def importance_select_sql(
    dialect: str, target_source: str = "src0", top_n: int = 50
) -> str:
    """Data selection by target-distribution matching (the DSIR idea):
    score every candidate doc by how much its unigrams look like a
    small high-quality target corpus (here: the ``target_source``
    slice), and keep the top-N. The scale shape: one token explode, a
    vocab-sized weight table joined BROADCAST onto the token stream,
    one doc-keyed aggregation.

    Cross-engine exactness: classic DSIR sums per-token LOG likelihood
    ratios, but ln() is libm-dependent (Java Math.log vs C std::log
    can differ in the last ulp, and a fixed-point floor would amplify
    one ulp into a hash mismatch). This variant sums the *ratio*
    itself, add-one smoothed, as an exact integer:

        w(tok) = (2*t_cnt+1)(2*c_total+V) * 1e6
                 div (2*t_total+V)(2*c_cnt+1)

    — a monotone per-token affinity with the same selection behavior,
    BIGINT end-to-end (fits while corpus tokens < ~1e9 per reducer;
    shard the weight table beyond that). Doc score = mean token
    weight, one double division at the end.
    """
    idiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        explode = (
            "SELECT doc_id, source, explode(split(text, ' ')) AS tok FROM documents"
        )
    else:
        explode = (
            "SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok "
            "FROM documents"
        )
    return f"""
    WITH toks AS ({explode}),
    counts AS (
      SELECT tok, COUNT(*) AS c_cnt,
             SUM(CASE WHEN source = '{target_source}' THEN 1 ELSE 0 END) AS t_cnt
      FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT SUM(c_cnt) AS c_total, SUM(t_cnt) AS t_total, COUNT(*) AS vocab
      FROM counts
    ),
    w AS (
      SELECT tok,
             ((2 * t_cnt + 1) * (2 * c_total + vocab) * 1000000)
               {idiv} ((2 * t_total + vocab) * (2 * c_cnt + 1)) AS wf
      FROM counts CROSS JOIN tot
    ),
    scored AS (
      SELECT t.doc_id, SUM(w.wf) AS sw, COUNT(*) AS n_tok
      FROM toks t JOIN w ON t.tok = w.tok
      WHERE t.source <> '{target_source}'
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           ROUND(CAST(sw AS DOUBLE) / (1000000.0 * n_tok), 9) AS affinity
    FROM scored
    ORDER BY affinity DESC, doc_id
    LIMIT {top_n}
    """


def weighted_sample_sql(dialect: str, k: int = 100) -> str:
    """Deterministic weighted sampling without replacement (the
    Efraimidis-Spirakis / priority-sampling shape a reproducible
    pipeline uses for importance-weighted corpus selection): each doc
    draws a "uniform" from a 60-bit md5 of its id and takes priority
    key u / w — the k smallest keys are the sample, so a doc's
    selection probability grows with its weight (here: token count)
    while the whole draw replays bit-identically on any cluster, any
    partitioning, any round.

    Cross-engine exactness: u and w are exact BIGINTs; the key is ONE
    IEEE division of their double conversions (correctly rounded,
    identical in both engines — no ln()/pow() of the classic
    u^(1/w) form, which would hinge on libm agreement); ties broken
    by doc_id. The classic exponential form orders identically for
    fixed u because x -> u^(1/x) is monotone in x.

    Scale shape: map-only key computation (no shuffle) into a global
    top-k — Spark plans TakeOrderedAndProject (per-partition heaps,
    k rows to the driver), never a full sort. At 100 TB this is the
    cheapest possible distributed weighted draw: one scan, k rows
    moved.
    """
    from .dedup import DUCK, SPARK, _hex_int_expr

    d = SPARK if dialect == "spark" else DUCK
    s = d["string"]
    ntok = d["len"].format(arr=d["tokens"].format(col="text"))
    h = _hex_int_expr(d, f"md5(CAST(doc_id AS {s}))", nibbles=15)
    return f"""
    WITH keyed AS (
      SELECT doc_id,
             CAST({ntok} AS BIGINT) AS weight_tokens,
             (CAST({h} + 1 AS DOUBLE) / 1152921504606846976.0)
               / CAST({ntok} AS DOUBLE) AS priority
      FROM documents
    )
    SELECT doc_id, weight_tokens, priority
    FROM keyed
    ORDER BY priority, doc_id
    LIMIT {k}
    """


def tfidf_cosine_sql(
    dialect: str,
    terms: tuple[str, ...] = DEFAULT_TERMS,
    top_k: int = 20,
) -> str:
    """TF-IDF cosine retrieval (the classic vector-space twin of
    ``bm25_sql``): docs ranked by cosine between their full TF-IDF
    vector and the query's, with true document norms over the WHOLE
    vocabulary — the corpus-statistics shape BM25 avoids, included
    deliberately because real rankers precompute exactly these norms.

    Weights are smoothed ltc: (tf/dl) * (ln((N+1)/(df+1)) + 1), fixed
    to e5 integers so every SUM (doc norm**2, query dot) is an exact
    BIGINT — order-independent across any shuffle/partitioning — and
    small enough that CAST(... AS DOUBLE) is exact (< 2**53; w_e5 <=
    ~1e6, squared 1e12, x ~1e3 distinct terms/doc). The only
    engine-parity risk is ln() differing in the last ulp exactly at a
    FLOOR(1e5*x) boundary (~1e-11 per distinct (tf/dl, df) value —
    the same documented rule as bm25_sql's ROUND). Final cosine is
    division + sqrt (both IEEE-exact) rounded to 6 digits.

    Scale shape: one token explode feeds tf / dl / df; the df join
    back onto tf rows is token-keyed (Zipf-skewed head — AQE skew
    join here, or broadcast the top-M df entries at 100 TB); norms
    and dot are doc-keyed aggregations with map-side combine. The
    query-side relation is |terms| rows, broadcast everywhere.
    """
    if dialect == "spark":
        explode = "SELECT doc_id, explode(split(text, ' ')) AS token FROM documents"
    else:
        explode = (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
        )
    term_list = ", ".join(f"'{t}'" for t in terms)
    idf = "(ln((CAST(n.n_docs AS DOUBLE) + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)) + 1.0)"
    return f"""
    WITH inv AS ({explode}),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM inv GROUP BY doc_id, token),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM inv GROUP BY doc_id),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM inv GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.token,
             CAST(FLOOR(100000.0 * (CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE))
                        * {idf}) AS BIGINT) AS w_e5
      FROM tf
      JOIN dl ON tf.doc_id = dl.doc_id
      JOIN df ON tf.token = df.token
      CROSS JOIN n
    ),
    norms AS (
      SELECT doc_id, CAST(SUM(w_e5 * w_e5) AS DOUBLE) AS norm2_e10
      FROM w GROUP BY doc_id
    ),
    qw AS (
      SELECT df.token, CAST(FLOOR(100000.0 * {idf}) AS BIGINT) AS qw_e5
      FROM df CROSS JOIN n
      WHERE df.token IN ({term_list})
    ),
    qnorm AS (SELECT CAST(SUM(qw_e5 * qw_e5) AS DOUBLE) AS qnorm2_e10 FROM qw),
    dot AS (
      SELECT w.doc_id, CAST(SUM(w.w_e5 * q.qw_e5) AS DOUBLE) AS dot_e10
      FROM w JOIN qw q ON w.token = q.token
      GROUP BY w.doc_id
    )
    SELECT d.doc_id,
           ROUND(d.dot_e10 / (sqrt(nm.norm2_e10) * sqrt(qn.qnorm2_e10)), 6)
             AS tfidf_cosine
    FROM dot d
    JOIN norms nm ON d.doc_id = nm.doc_id
    CROSS JOIN qnorm qn
    ORDER BY tfidf_cosine DESC, d.doc_id
    LIMIT {top_k}
    """


def rag_pipeline_sql(
    dialect: str,
    terms: tuple[str, ...] = DEFAULT_TERMS,
    chunk_chars: int = 200,
    overlap: int = 50,
    k_each: int = 20,
    k: int = 10,
    rrf_k: int = 60,
) -> str:
    """Retrieval-pipeline flagship: the RAG indexing + query path as
    ONE declarative plan — quality-gate docs, window them into
    overlapping chunks, rank chunks lexically (chunk-level BM25 over
    the query terms), rank their parent docs semantically (exact
    cosine on the embeddings table, vec_id == doc_id), and fuse both
    rankings with RRF into the top-k chunks with provenance
    (doc_id, chunk_id, chunk_start).

    The batch twin of what a serving stack does online; at 100 TB the
    chunk explode is map-only, the BM25 stages shuffle only term-hit
    rows (term filter applied before the shuffle, as in ``bm25_sql``),
    the semantic branch ends in a top-``k_each``
    TakeOrderedAndProject, and the fusion join touches <= 2*k_each
    rows. Parity rules are inherited: ln() under ROUND(6) for BM25,
    exact fixed-point dot products for cosine, integer ranks for RRF.
    """
    from .similarity import cosine_topk_sql

    stride = chunk_chars - overlap
    n_chunks = (
        f"GREATEST(CAST(1 AS BIGINT), "
        f"CAST(ceil((length(text) - {overlap}) / {stride}.0) AS BIGINT))"
    )
    if dialect == "spark":
        gen = (
            "SELECT doc_id, text, i FROM base "
            "LATERAL VIEW explode(sequence(0, CAST(nc - 1 AS INT))) g AS i"
        )
        tok = "explode(split(chunk, ' '))"
        dl = "size(split(chunk, ' '))"
    else:
        gen = "SELECT doc_id, text, unnest(range(0, nc)) AS i FROM base"
        tok = "unnest(string_split(chunk, ' '))"
        dl = "len(string_split(chunk, ' '))"
    term_list = ", ".join(f"'{t}'" for t in terms)
    sem = cosine_topk_sql(dialect, k=k_each)
    return f"""
    WITH base AS (
      SELECT doc_id, text, {n_chunks} AS nc FROM documents
      WHERE length(text) >= 40
    ),
    gen AS ({gen}),
    chunks AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_id,
             CAST(i * {stride} + 1 AS BIGINT) AS chunk_start,
             substring(text, CAST(i * {stride} + 1 AS INT), {chunk_chars}) AS chunk
      FROM gen
    ),
    inv AS (SELECT doc_id, chunk_id, {tok} AS token FROM chunks),
    hits AS (SELECT doc_id, chunk_id, token FROM inv WHERE token IN ({term_list})),
    tf AS (
      SELECT doc_id, chunk_id, token, COUNT(*) AS tf
      FROM hits GROUP BY doc_id, chunk_id, token
    ),
    df AS (
      SELECT token, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, chunk_id, token FROM hits) h GROUP BY token
    ),
    clen AS (SELECT doc_id, chunk_id, {dl} AS dl FROM chunks),
    stats AS (
      SELECT COUNT(*) AS n_chunks,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM clen
    ),
    scored AS (
      SELECT t.doc_id, t.chunk_id,
             SUM(
               ln((CAST(s.n_chunks - d.df AS DOUBLE) + 0.5)
                  / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
               * (CAST(t.tf AS DOUBLE) * 2.2)
               / (CAST(t.tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE) / s.avgdl))
             ) AS score
      FROM tf t
      JOIN df d ON t.token = d.token
      JOIN clen l ON t.doc_id = l.doc_id AND t.chunk_id = l.chunk_id
      CROSS JOIN stats s
      GROUP BY t.doc_id, t.chunk_id
    ),
    lex AS (
      SELECT doc_id, chunk_id,
             ROW_NUMBER() OVER (
               ORDER BY ROUND(score, 6) DESC, doc_id, chunk_id) AS r
      FROM scored
      ORDER BY ROUND(score, 6) DESC, doc_id, chunk_id
      LIMIT {k_each}
    ),
    sem AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS r
      FROM ({sem}) c
    ),
    fused AS (
      SELECT l.doc_id, l.chunk_id,
             CAST(1 AS DOUBLE) / ({rrf_k} + l.r)
               + COALESCE(CAST(1 AS DOUBLE) / ({rrf_k} + s.r), CAST(0 AS DOUBLE))
               AS rrf,
             l.r AS lex_rank, s.r AS sem_rank
      FROM lex l LEFT JOIN sem s ON l.doc_id = s.doc_id
    )
    SELECT f.doc_id, f.chunk_id, c.chunk_start,
           ROUND(f.rrf, 9) AS rrf_score,
           CAST(f.lex_rank AS INT) AS lex_rank,
           CAST(COALESCE(f.sem_rank, 0) AS INT) AS sem_rank
    FROM fused f
    JOIN chunks c ON f.doc_id = c.doc_id AND f.chunk_id = c.chunk_id
    ORDER BY rrf_score DESC, f.doc_id, f.chunk_id
    LIMIT {k}
    """
