"""Independent-oracle hardening for the similarity families
(VERDICT r8 #3, sibling of test_dedup_python_reference).

PQ-ADC and int8-quantized top-k emit both dialects from one template;
these tests pin the DuckDB oracle SQL against plain-Python references
(floor/int arithmetic, no SQL) on hypothesis-generated random
embeddings, so a template-level semantic bug cannot hide behind the
Spark-vs-DuckDB parity check.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.operators import similarity

DIM = 16  # small dim keeps the naive CTE chain fast per example
FP = 10**6


def _con(vecs: np.ndarray) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "label": [f"v{i}" for i in range(len(vecs))],
                "embedding": [v.tolist() for v in vecs],
            }
        ),
    )
    return con


embeddings_strategy = st.builds(
    lambda seed, n: np.random.RandomState(seed)
    .uniform(-1.0, 1.0, size=(n, DIM))
    .astype(np.float32),
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(6, 24),
)


# -- PQ-ADC -----------------------------------------------------------------


def ref_pq_topk(
    vecs: np.ndarray,
    query_vec_id: int = 0,
    m_sub: int = 4,
    k_sub: int = 8,
    k: int = 5,
    dim: int = DIM,
) -> list[tuple[int, int, int]]:
    sub_dim = dim // m_sub
    n = len(vecs)
    # 1e-6 fixed-point per element (floor of the f32->double product)
    xf = [[math.floor(float(v) * FP) for v in vec] for vec in vecs]
    n_cb = min(k_sub, n)
    # enc_dist[vec][m][c]: squared distance to codebook entry c (the
    # m-th subvector of vector c), exact integer arithmetic
    def d2(vec: int, m: int, c: int) -> int:
        return sum(
            (xf[vec][m * sub_dim + dl] - xf[c][m * sub_dim + dl]) ** 2
            for dl in range(sub_dim)
        )

    codes = {
        vec: [
            min(range(n_cb), key=lambda c: (d2(vec, m, c), c))
            for m in range(m_sub)
        ]
        for vec in range(n)
    }
    packed = {
        vec: sum(codes[vec][m] * k_sub**m for m in range(m_sub))
        for vec in range(n)
    }
    adc = {
        vec: sum(d2(query_vec_id, m, codes[vec][m]) for m in range(m_sub))
        for vec in range(n)
        if vec != query_vec_id
    }
    ranked = sorted(adc, key=lambda v: (adc[v], v))[:k]
    return [(v, packed[v], adc[v]) for v in ranked]


@settings(max_examples=40, deadline=None)
@given(embeddings_strategy)
def test_pq_oracle_matches_python_reference(vecs):
    got = (
        _con(vecs)
        .execute(
            similarity.pq_topk_sql(
                "duckdb", m_sub=4, k_sub=8, k=5, dim=DIM
            )
        )
        .fetchall()
    )
    assert [tuple(r) for r in got] == ref_pq_topk(vecs)


# -- int8 quantized top-k ---------------------------------------------------


def ref_int8_topk(
    vecs: np.ndarray, query_vec_id: int = 0, k: int = 5, dim: int = DIM
) -> list[tuple[int, str, int]]:
    def quant(vec: np.ndarray) -> list[int]:
        ma = max(max(abs(float(v)) for v in vec), 1e-30)
        return [math.floor(float(v) * 127.0 / ma + 0.5) for v in vec]

    q = quant(vecs[query_vec_id])
    scored = {
        i: sum(a * b for a, b in zip(quant(vecs[i]), q))
        for i in range(len(vecs))
        if i != query_vec_id
    }
    ranked = sorted(scored, key=lambda v: (-scored[v], v))[:k]
    return [(v, f"v{v}", scored[v]) for v in ranked]


@settings(max_examples=40, deadline=None)
@given(embeddings_strategy)
def test_int8_oracle_matches_python_reference(vecs):
    got = (
        _con(vecs)
        .execute(similarity.int8_topk_sql("duckdb", k=5, dim=DIM))
        .fetchall()
    )
    assert [tuple(r) for r in got] == ref_int8_topk(vecs)


# -- exact fixed-point cosine (the brute-force baseline) --------------------


def ref_cosine_topk(
    vecs: np.ndarray, query_vec_id: int = 0, k: int = 5, dim: int = DIM
) -> list[int]:
    scale = similarity.SCALE

    def fdot(a: np.ndarray, b: np.ndarray) -> float:
        return (
            sum(
                math.floor(float(x) * float(y) * scale)
                for x, y in zip(a, b)
            )
            / scale
        )

    q = vecs[query_vec_id]
    # the oracle ranks the 12-digit-ROUNDed cosine; mirror it so a
    # near-tie cannot order differently (round-half mode differences
    # only matter at an exact .5 in the 12th digit — measure zero)
    cos = {
        i: round(
            fdot(vecs[i], q)
            / (math.sqrt(fdot(vecs[i], vecs[i])) * math.sqrt(fdot(q, q))),
            12,
        )
        for i in range(len(vecs))
        if i != query_vec_id
    }
    return sorted(cos, key=lambda v: (-cos[v], v))[:k]


@settings(max_examples=40, deadline=None)
@given(embeddings_strategy)
def test_cosine_oracle_matches_python_reference(vecs):
    got = (
        _con(vecs)
        .execute(similarity.cosine_topk_sql("duckdb", k=5, dim=DIM))
        .fetchall()
    )
    assert [r[0] for r in got] == ref_cosine_topk(vecs)
