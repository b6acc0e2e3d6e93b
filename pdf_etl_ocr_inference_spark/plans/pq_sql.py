"""DuckDB-SQL replay of the FIXED-POINT product-quantization path.

``operators/pq.train_pq_codebooks_q`` / ``pq_encode_q`` /
``topk_pq_q`` are integer arithmetic end to end (see the module
comment there), so the whole pipeline — subspace k-means training
INCLUDED — replays as one CTE chain:

- ``qn``: quantize-normalized corpus (xq = floor(x·2^20); one
  correctly-rounded sqrt + divide; xn = floor(·2^17));
- ``pt``: the id-ordered hash sample exploded to (id, subspace j,
  dim i, value) rows;
- ``bk0..bk{T}``: k-means — init is the first k id-ordered rows per
  subspace; assignment argmin of exact-int squared L2 (ties → lowest
  centroid index); update = floor-div integer means with empty
  clusters keeping their centroid;
- ``enc``: corpus codes = per-row per-subspace argmin vs final books;
- ADC: integer LUT join on (subspace, code), candidates by
  (adc, vec_id) under QUALIFY, exact cosine top-k re-rank (the
  op44-proven float path).

Every CTE that is referenced more than once is MATERIALIZED (the
LR/BPE chain lesson: inlining doubles the tree per round).
"""

from __future__ import annotations

from pdf_etl_ocr_inference_spark.operators.pq import PQ_TRAIN_TARGET

# the engine-side scales (operators/pq.py)
COORD = 1048576.0  # 2^20
NORM = 131072.0  # 2^17


def _sample_pred(id_expr: str, sample_mod: int | None) -> str:
    """The training-sample predicate.  ``sample_mod=None`` replays the
    engine's fixed-size-sample derivation (operators/pq.py
    ``derive_sample_mod``): modulus = max(1, n // PQ_TRAIN_TARGET)
    from the corpus count — the SQL twin of the cheap distributed
    ``count()``, so oracle and engine pick the SAME sample at every
    SF without baking a corpus-specific modulus into the string."""
    if sample_mod is not None:
        return f"{id_expr} % {sample_mod} = 0"
    return (
        f"{id_expr} % GREATEST(1, "
        f"(SELECT COUNT(*) FROM qn) // {PQ_TRAIN_TARGET}) = 0"
    )


def _qn_ctes(source: str = "embeddings") -> str:
    return (
        f"xq AS (SELECT vec_id, embedding, list_transform(embedding, "
        f"x -> CAST(FLOOR(x::DOUBLE * {COORD}) AS BIGINT)) AS q "
        f"FROM {source}), "
        f"qn AS MATERIALIZED (SELECT vec_id, embedding, CASE WHEN nsq = 0 "
        f"THEN list_transform(q, v -> CAST(0 AS BIGINT)) "
        f"ELSE list_transform(q, v -> CAST(FLOOR(CAST(v AS DOUBLE) "
        f"/ SQRT(CAST(nsq AS DOUBLE)) * {NORM}) AS BIGINT)) END AS xn "
        f"FROM (SELECT vec_id, embedding, q, "
        f"list_sum(list_transform(q, v -> v * v)) AS nsq FROM xq))"
    )


def _kmeans_ctes(
    m: int, k: int, iters: int, sub: int, sample_mod: int | None
) -> str:
    """bk{iters}(j, cidx, i, val) — final integer codebooks."""
    parts = [
        # sample points exploded per (subspace, dim-within-subspace)
        f"pt AS MATERIALIZED (SELECT vec_id, CAST(i // {sub} AS INT) AS j, "
        f"CAST(i % {sub} AS INT) AS i, xn[i + 1] AS val "
        f"FROM (SELECT vec_id, xn FROM qn "
        f"WHERE {_sample_pred('vec_id', sample_mod)}), "
        f"UNNEST(range(0, len(xn))) AS r(i)), "
        # init: the first k id-ordered sample rows per subspace
        f"bk0 AS MATERIALIZED (SELECT j, CAST(rnk - 1 AS INT) AS cidx, "
        f"i, val FROM (SELECT j, i, val, DENSE_RANK() OVER "
        f"(PARTITION BY j ORDER BY vec_id) AS rnk FROM pt) "
        f"WHERE rnk <= {k})"
    ]
    for t in range(1, iters + 1):
        parts.append(_kmeans_round(t, f"bk{t - 1}"))
    return ", ".join(parts)


def _kmeans_round(t: int, prev: str, pts: str = "pt", px: str = "") -> str:
    """One integer k-means iteration over the ``pts`` point table.
    ``px`` prefixes the round CTE names so two independent chains
    (e.g. IVF-PQ's coarse quantizer + residual codebooks) can coexist
    in one statement."""
    return (
        # exact-int squared L2 per (point, subspace, centroid)
        f"{px}d{t} AS (SELECT p.vec_id, p.j, b.cidx, "
        f"SUM((p.val - b.val) * (p.val - b.val)) AS d2 "
        f"FROM {pts} p JOIN {prev} b ON b.j = p.j AND b.i = p.i "
        f"GROUP BY p.vec_id, p.j, b.cidx), "
        # argmin; ties break to the lowest centroid index
        f"{px}a{t} AS MATERIALIZED (SELECT vec_id, j, cidx FROM "
        f"(SELECT vec_id, j, cidx, ROW_NUMBER() OVER "
        f"(PARTITION BY vec_id, j ORDER BY d2, cidx) AS rn FROM {px}d{t}) "
        f"WHERE rn = 1), "
        # floor-div integer means; empty clusters keep the centroid
        f"{px}u{t} AS (SELECT a.j, a.cidx, p.i, "
        f"CAST((SUM(p.val) - ((SUM(p.val) % COUNT(*) + COUNT(*)) "
        f"% COUNT(*))) / COUNT(*) AS BIGINT) AS val "
        f"FROM {px}a{t} a JOIN {pts} p ON p.vec_id = a.vec_id "
        f"AND p.j = a.j "
        f"GROUP BY a.j, a.cidx, p.i), "
        f"{px}bk{t} AS MATERIALIZED (SELECT b.j, b.cidx, b.i, "
        f"COALESCE(u.val, b.val) AS val FROM {prev} b "
        f"LEFT JOIN {px}u{t} u ON u.j = b.j AND u.cidx = b.cidx "
        f"AND u.i = b.i)"
    )


def pq_topk_sql(
    m: int = 8,
    k_cents: int = 16,
    iters: int = 10,
    sample_mod: int | None = None,
    dim: int = 64,
    k: int = 5,
    rerank_floor: int = 50,
    rerank_frac: int = 10,
) -> str:
    """Oracle for ``ann_pq_topk`` (fixed-point path)."""
    sub = dim // m
    books = f"bk{iters}"
    return (
        "WITH "
        + _qn_ctes()
        + ", "
        + _kmeans_ctes(m, k_cents, iters, sub, sample_mod)
        + ", "
        # corpus points (vec 0 excluded from candidates, kept as query)
        f"cpt AS MATERIALIZED (SELECT vec_id, CAST(i // {sub} AS INT) "
        f"AS j, CAST(i % {sub} AS INT) AS i, xn[i + 1] AS val "
        f"FROM qn, UNNEST(range(0, len(xn))) AS r(i) "
        f"WHERE vec_id <> 0), "
        # encode: per-row per-subspace argmin vs the final books
        f"enc AS MATERIALIZED (SELECT vec_id, j, cidx AS code FROM "
        f"(SELECT c.vec_id, c.j, b.cidx, ROW_NUMBER() OVER "
        f"(PARTITION BY c.vec_id, c.j ORDER BY "
        f"SUM((c.val - b.val) * (c.val - b.val)), b.cidx) AS rn "
        f"FROM cpt c JOIN {books} b ON b.j = c.j AND b.i = c.i "
        f"GROUP BY c.vec_id, c.j, b.cidx) WHERE rn = 1), "
        # integer LUT from the quantize-normalized query (vec 0)
        f"qpt AS (SELECT CAST(i // {sub} AS INT) AS j, "
        f"CAST(i % {sub} AS INT) AS i, xn[i + 1] AS val "
        f"FROM qn, UNNEST(range(0, len(xn))) AS r(i) WHERE vec_id = 0), "
        f"lut AS MATERIALIZED (SELECT b.j, b.cidx, "
        f"SUM((q.val - b.val) * (q.val - b.val)) AS d FROM {books} b "
        f"JOIN qpt q ON q.j = b.j AND q.i = b.i GROUP BY b.j, b.cidx), "
        # ADC scan + candidate pool (exactly max(floor, n // frac))
        f"adc AS (SELECT e.vec_id, SUM(l.d) AS adc FROM enc e "
        f"JOIN lut l ON l.j = e.j AND l.cidx = e.code "
        f"GROUP BY e.vec_id), "
        f"cand AS (SELECT vec_id FROM adc "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY adc, vec_id) <= "
        f"GREATEST({rerank_floor}, "
        f"(SELECT COUNT(*) FROM embeddings) // {rerank_frac})) "
        # exact cosine top-k re-rank (the op44-proven float path)
        f"SELECT e.vec_id, ROUND(LIST_COSINE_SIMILARITY("
        f"e.embedding::DOUBLE[], qv.embedding::DOUBLE[]), 4) AS score "
        f"FROM embeddings e JOIN cand USING (vec_id), "
        f"(SELECT embedding FROM embeddings WHERE vec_id = 0) qv "
        f"ORDER BY ROUND(LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], "
        f"qv.embedding::DOUBLE[]), 4) DESC, e.vec_id LIMIT {k}"
    )


def ivfpq_topk_sql(
    m: int = 8,
    k_cents: int = 16,
    iters: int = 10,
    sample_mod: int | None = None,
    dim: int = 64,
    k: int = 5,
    n_probe: int = 3,
    rerank_floor: int = 50,
    rerank_frac: int = 10,
    n_cells: int = 10,
    coarse_iters: int = 10,
) -> str:
    """Oracle for ``ann_ivfpq_topk`` (fixed-point IVFADC): coarse
    cells LEARNED by whole-vector integer k-means over the train
    sample (r8 — the same k-means chain run at m=1; label means of
    isotropic embeddings were noise-scale and the probe was
    near-random), residual points, the same integer k-means chain
    for codebooks, per probed cell an integer residual LUT,
    cell-filtered ADC, exact cosine re-rank.  The coarse probe ranks
    cells by exact int dot (ties → smallest label) — identical in
    Python and SQL."""
    sub = dim // m
    books = f"bk{iters}"
    return (
        "WITH "
        + _qn_ctes()
        + ", "
        # every row's xn exploded (shared by coarse training,
        # assignment, and residual derivation)
        f"xnp AS MATERIALIZED (SELECT vec_id, CAST(i AS INT) AS i, "
        f"xn[i + 1] AS val FROM qn, UNNEST(range(0, len(xn))) AS r(i)), "
        # coarse cells: whole-vector integer k-means over the sample
        # (one subspace j=0 spanning every dim — the m=1 chain)
        f"kpt AS MATERIALIZED (SELECT vec_id, CAST(0 AS INT) AS j, "
        f"i, val FROM xnp WHERE {_sample_pred('vec_id', sample_mod)}), "
        f"kbk0 AS MATERIALIZED (SELECT j, CAST(rnk - 1 AS INT) AS cidx, "
        f"i, val FROM (SELECT j, i, val, DENSE_RANK() OVER "
        f"(PARTITION BY j ORDER BY vec_id) AS rnk FROM kpt) "
        f"WHERE rnk <= {n_cells}), "
        + ", ".join(
            _kmeans_round(t, f"kbk{t - 1}", pts="kpt", px="k")
            for t in range(1, coarse_iters + 1)
        )
        + ", "
        f"cq AS MATERIALIZED (SELECT cidx AS label, i, val "
        f"FROM kbk{coarse_iters}), "
        f"dots AS (SELECT x.vec_id, c.label, SUM(x.val * c.val) AS d "
        f"FROM xnp x JOIN cq c ON c.i = x.i GROUP BY x.vec_id, c.label), "
        f"asg AS MATERIALIZED (SELECT vec_id, label AS cell FROM ("
        f"SELECT vec_id, label, ROW_NUMBER() OVER (PARTITION BY vec_id "
        f"ORDER BY d DESC, label) AS rn FROM dots) WHERE rn = 1), "
        # residual sample points, subspace-exploded, for the k-means
        f"pt AS MATERIALIZED (SELECT x.vec_id, "
        f"CAST(x.i // {sub} AS INT) AS j, CAST(x.i % {sub} AS INT) AS i, "
        f"x.val - c.val AS val FROM xnp x JOIN asg a USING (vec_id) "
        f"JOIN cq c ON c.label = a.cell AND c.i = x.i "
        f"WHERE {_sample_pred('x.vec_id', sample_mod)}), "
        f"bk0 AS MATERIALIZED (SELECT j, CAST(rnk - 1 AS INT) AS cidx, "
        f"i, val FROM (SELECT j, i, val, DENSE_RANK() OVER "
        f"(PARTITION BY j ORDER BY vec_id) AS rnk FROM pt) "
        f"WHERE rnk <= {k_cents}), "
        + ", ".join(_kmeans_round(t, f"bk{t - 1}") for t in range(1, iters + 1))
        + ", "
        # corpus residual points (vec 0 excluded) + codes
        f"crp AS MATERIALIZED (SELECT x.vec_id, a.cell, "
        f"CAST(x.i // {sub} AS INT) AS j, CAST(x.i % {sub} AS INT) AS i, "
        f"x.val - c.val AS val FROM xnp x JOIN asg a USING (vec_id) "
        f"JOIN cq c ON c.label = a.cell AND c.i = x.i "
        f"WHERE x.vec_id <> 0), "
        f"enc AS MATERIALIZED (SELECT vec_id, cell, j, cidx AS code FROM "
        f"(SELECT c.vec_id, c.cell, c.j, b.cidx, ROW_NUMBER() OVER "
        f"(PARTITION BY c.vec_id, c.j ORDER BY "
        f"SUM((c.val - b.val) * (c.val - b.val)), b.cidx) AS rn "
        f"FROM crp c JOIN {books} b ON b.j = c.j AND b.i = c.i "
        f"GROUP BY c.vec_id, c.cell, c.j, b.cidx) WHERE rn = 1), "
        # probed cells: best int dot vs the query's xn
        f"qx AS (SELECT CAST(i AS INT) AS i, xn[i + 1] AS val FROM qn, "
        f"UNNEST(range(0, len(xn))) AS r(i) WHERE vec_id = 0), "
        f"qcell AS MATERIALIZED (SELECT label AS cell FROM ("
        f"SELECT c.label, ROW_NUMBER() OVER (ORDER BY "
        f"SUM(q.val * c.val) DESC, c.label) AS rn FROM cq c "
        f"JOIN qx q ON q.i = c.i GROUP BY c.label) WHERE rn <= {n_probe}), "
        # per probed cell: integer residual LUT
        f"lut AS MATERIALIZED (SELECT pc.cell, b.j, b.cidx, "
        f"SUM(((q.val - c.val) - b.val) * ((q.val - c.val) - b.val)) AS d "
        f"FROM qcell pc JOIN cq c ON c.label = pc.cell "
        f"JOIN qx q ON q.i = c.i "
        f"JOIN {books} b ON b.i = (c.i % {sub}) AND b.j = (c.i // {sub}) "
        f"GROUP BY pc.cell, b.j, b.cidx), "
        f"adc AS (SELECT e.vec_id, SUM(l.d) AS adc FROM enc e "
        f"JOIN lut l ON l.cell = e.cell AND l.j = e.j AND l.cidx = e.code "
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
