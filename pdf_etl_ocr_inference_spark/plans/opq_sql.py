"""Lazy DuckDB oracle for ``ann_opq_topk`` (fixed-point OPQ, r8).

The OPQ rotation is learned by an SVD alternation no SQL engine can
replay — but (the ann_pca_project doctrine) everything AFTER it can:
the generator collects the SAME id-ordered fixed-size sample straight
from the parquet, runs the SAME shared float trainer
(``operators/pq._train_opq_mat`` — identical doubles in, bit-identical
rotation out in-process), quantizes the rotation with
``quantize_rotation``, and emits it as 4096 integer literals.  From
there the SQL replays the ENTIRE data plane exactly:

    xn    : quantize-normalize (pq_sql's qn CTEs, 2^17 scale)
    rxs_j : (Σ_i xn_i·rq_ij) // 2^20   (exact int64, nonneg-mod floor)
    books : integer k-means over the rotated sample (the pq_sql
            k-means rounds, first-k init, floor-div means)
    enc   : per-subspace integer argmin codes over the corpus
    ADC   : integer LUT fold from the rotated query, (adc, vec_id)
            candidate pool, exact cosine re-rank

Resolved lazily against ``SPARK_GRAFT_ORACLE_SF_DIR`` because the
rotation literals depend on the corpus (plans/registry.resolve_oracle).
"""

from __future__ import annotations

import os

from pdf_etl_ocr_inference_spark.operators.pq import PQ_TRAIN_TARGET
from pdf_etl_ocr_inference_spark.plans.pq_sql import (
    _kmeans_round,
    _qn_ctes,
    _sample_pred,
)

_DEFAULT_SF = "/root/testdata/sf0.01"

# floor-div by 2^20 in SQL: (s - nonneg_mod(s, 2^20)) / 2^20 — the
# difference is an exact multiple, so the double divide is exact
_FDIV = (
    "CAST((({s}) - ((({s}) % 1048576 + 1048576) % 1048576)) "
    "/ 1048576 AS BIGINT)"
)


def _trained_rq(sf_dir: str, m: int, k: int, iters: int, opq_iters: int,
                seed: int) -> list:
    """Quantized rotation from a direct parquet replay of the
    engine's sample + shared float trainer."""
    import duckdb
    import numpy as np

    from pdf_etl_ocr_inference_spark.operators.pq import (
        _normalize,
        _train_opq_mat,
        quantize_rotation,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    mod = max(1, len(rows) // PQ_TRAIN_TARGET)
    sample = [emb for vid, emb in rows if vid % mod == 0]
    x = np.stack([_normalize(v) for v in sample])
    r_mat, _books = _train_opq_mat(x, m, k, iters, opq_iters, seed)
    return quantize_rotation(r_mat)


def opq_topk_oracle(
    m: int = 8,
    k_cents: int = 16,
    iters: int = 10,
    opq_iters: int = 3,
    dim: int = 64,
    k: int = 5,
    rerank_floor: int = 50,
    rerank_frac: int = 10,
    seed: int = 42,
):
    """Zero-arg lazy-oracle factory for ``ann_opq_topk``."""

    def generate() -> str:
        sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", _DEFAULT_SF)
        rq = _trained_rq(sf_dir, m, k_cents, iters, opq_iters, seed)
        sub = dim // m
        books = f"bk{iters}"
        rq_rows = ", ".join(
            f"({i}, {j}, {rq[i][j]})"
            for i in range(dim)
            for j in range(dim)
        )
        s = "SUM(x.val * r.val)"
        return (
            "WITH "
            + _qn_ctes()
            + ", "
            f"rq(i, j, val) AS (SELECT * FROM (VALUES {rq_rows}) "
            f"AS t(i, j, val)), "
            # every vector's xn exploded, then rotated+rescaled
            f"xnp AS MATERIALIZED (SELECT vec_id, CAST(i AS INT) AS i, "
            f"xn[i + 1] AS val FROM qn, UNNEST(range(0, len(xn))) AS r(i)), "
            f"rxp AS MATERIALIZED (SELECT x.vec_id, r.j, "
            f"{_FDIV.format(s=s)} AS val "
            f"FROM xnp x JOIN rq r ON r.i = x.i GROUP BY x.vec_id, r.j), "
            # rotated sample points, subspace-split, for the k-means
            f"pt AS MATERIALIZED (SELECT vec_id, "
            f"CAST(j // {sub} AS INT) AS j, CAST(j % {sub} AS INT) AS i, "
            f"val FROM rxp WHERE {_sample_pred('vec_id', None)}), "
            f"bk0 AS MATERIALIZED (SELECT j, CAST(rnk - 1 AS INT) AS cidx, "
            f"i, val FROM (SELECT j, i, val, DENSE_RANK() OVER "
            f"(PARTITION BY j ORDER BY vec_id) AS rnk FROM pt) "
            f"WHERE rnk <= {k_cents}), "
            + ", ".join(
                _kmeans_round(t, f"bk{t - 1}") for t in range(1, iters + 1)
            )
            + ", "
            # corpus rotated points (vec 0 excluded) + codes
            f"cpt AS MATERIALIZED (SELECT vec_id, "
            f"CAST(j // {sub} AS INT) AS j, CAST(j % {sub} AS INT) AS i, "
            f"val FROM rxp WHERE vec_id <> 0), "
            f"enc AS MATERIALIZED (SELECT vec_id, j, cidx AS code FROM "
            f"(SELECT c.vec_id, c.j, b.cidx, ROW_NUMBER() OVER "
            f"(PARTITION BY c.vec_id, c.j ORDER BY "
            f"SUM((c.val - b.val) * (c.val - b.val)), b.cidx) AS rn "
            f"FROM cpt c JOIN {books} b ON b.j = c.j AND b.i = c.i "
            f"GROUP BY c.vec_id, c.j, b.cidx) WHERE rn = 1), "
            # rotated query LUT (vec 0)
            f"qpt AS (SELECT CAST(j // {sub} AS INT) AS j, "
            f"CAST(j % {sub} AS INT) AS i, val FROM rxp WHERE vec_id = 0), "
            f"lut AS MATERIALIZED (SELECT b.j, b.cidx, "
            f"SUM((q.val - b.val) * (q.val - b.val)) AS d FROM {books} b "
            f"JOIN qpt q ON q.j = b.j AND q.i = b.i GROUP BY b.j, b.cidx), "
            f"adc AS (SELECT e.vec_id, SUM(l.d) AS adc FROM enc e "
            f"JOIN lut l ON l.j = e.j AND l.cidx = e.code "
            f"GROUP BY e.vec_id), "
            f"cand AS (SELECT vec_id FROM adc "
            f"QUALIFY ROW_NUMBER() OVER (ORDER BY adc, vec_id) <= "
            f"GREATEST({rerank_floor}, "
            f"(SELECT COUNT(*) FROM embeddings) // {rerank_frac})) "
            f"SELECT e.vec_id, ROUND(LIST_COSINE_SIMILARITY("
            f"e.embedding::DOUBLE[], qv.embedding::DOUBLE[]), 4) AS score "
            f"FROM embeddings e JOIN cand USING (vec_id), "
            f"(SELECT embedding FROM embeddings WHERE vec_id = 0) qv "
            f"ORDER BY ROUND(LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], "
            f"qv.embedding::DOUBLE[]), 4) DESC, e.vec_id LIMIT {k}"
        )

    return generate
