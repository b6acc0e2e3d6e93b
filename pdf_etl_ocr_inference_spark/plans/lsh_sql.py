"""DuckDB-SQL generators replaying the fixed-point LSH machinery.

The engine's random-hyperplane signatures (operators/similarity.py)
are fixed-point EXACT: every bit is the sign of an int64 dot product
of floor(x·2^20)-quantized coordinates against floor(p·2^20)-quantized
module-constant planes.  Multiplying an IEEE double by 2^20 is exact,
so Spark, driver-side Python, and DuckDB compute identical
signatures — which makes the whole bucket-probe ANN family
oracle-able: these helpers emit the ANSI-SQL side.

Hamming-ball membership is expressed query-relative:
``xor(sig(row), sig(query)) IN (<masks of weight ≤ r>)`` — the mask
set is data-INDEPENDENT, so the generated SQL carries only plane
constants, never fixture values.
"""

from __future__ import annotations

import itertools

from pdf_etl_ocr_inference_spark.operators.similarity import (
    quantized_planes,
)

# floor(x * 2^20) of every coordinate, as a BIGINT list — exact, see
# operators/similarity.py:LSH_Q_SCALE.
XQ_SQL = (
    "list_transform({col}, x -> "
    "CAST(FLOOR(x::DOUBLE * 1048576.0) AS BIGINT))"
)


def xq_sql(col: str = "embedding") -> str:
    return XQ_SQL.format(col=col)


def sig_sql(
    dim: int, n_planes: int, seed: int, q_col: str = "q"
) -> str:
    """One table's signature as a scalar SQL expression over ``q_col``
    (a pre-quantized BIGINT list, see :func:`xq_sql`)."""
    planes = quantized_planes(dim, n_planes, seed)
    bits = []
    for j, p in enumerate(planes):
        terms = " + ".join(
            f"{q_col}[{i + 1}]*({int(v)})" for i, v in enumerate(p)
        )
        bits.append(
            f"(CASE WHEN ({terms}) > 0 THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(bits) + ")"


def hamming_masks(n_planes: int, radius: int) -> list[int]:
    """Every bit mask of Hamming weight ≤ radius over n_planes bits."""
    return [
        sum(1 << b for b in combo)
        for r in range(radius + 1)
        for combo in itertools.combinations(range(n_planes), r)
    ]


def masks_sql(n_planes: int, radius: int) -> str:
    return ", ".join(str(m) for m in hamming_masks(n_planes, radius))


def sigs_cte(
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    source: str = "embeddings",
) -> str:
    """CTE text computing (vec_id, embedding, s0..s{t-1}) for every
    row of ``source`` — the shared head of every LSH-entry oracle.
    Table t's plane family is seeded ``seed + 1000·t``, matching
    ``topk_lsh`` / ``lsh_near_pairs`` / ``build_lsh_index``."""
    sig_cols = ", ".join(
        f"{sig_sql(dim, n_planes, seed + 1000 * t)} AS s{t}"
        for t in range(n_tables)
    )
    return (
        f"xq AS (SELECT vec_id, embedding, {xq_sql()} AS q "
        f"FROM {source}), "
        f"sigs AS (SELECT vec_id, embedding, {sig_cols} FROM xq)"
    )


def any_table_ball_sql(
    left: str, right: str, n_tables: int, n_planes: int, radius: int
) -> str:
    """Membership predicate: rows collide when ANY table's signatures
    are within Hamming radius r (OR-amplification)."""
    ms = masks_sql(n_planes, radius)
    return " OR ".join(
        f"xor({left}.s{t}, {right}.s{t}) IN ({ms})"
        for t in range(n_tables)
    )


# ------------------------------------------------------------------
# Whole-entry oracle builders (plans/similarity_plans.py)
# ------------------------------------------------------------------

_COS = (
    "LIST_COSINE_SIMILARITY({a}::DOUBLE[], {b}::DOUBLE[])"
)


def lsh_topk_sql(
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 3,
    seed: int = 42,
    radius: int = 2,
    k: int = 5,
    source: str = "embeddings",
) -> str:
    """Oracle for the bucket-probe top-k entries (``ann_lsh_topk``,
    ``ann_rewrite_topk``): candidates = Hamming ball vs the vec_id=0
    query in ANY table, exact cosine re-rank, rounded-score ordering
    with id tie-break — exactly ``topk_lsh`` / the optimizer's probe
    + ``topk_exact``.  ``source`` may be a subquery (e.g. the
    POST-CHANGE-FEED corpus state for the incremental-index entries:
    an oracle that equals the probe result only if fold + tombstones
    + liveness resolution reproduce the rebuilt state)."""
    cos = _COS.format(a="c.embedding", b="qs.embedding")
    return (
        f"WITH {sigs_cte(dim, n_planes, n_tables, seed, source=source)}, "
        f"qs AS (SELECT * FROM sigs WHERE vec_id = 0), "
        f"cand AS (SELECT c.vec_id, ROUND({cos}, 4) AS score "
        f"FROM sigs c, qs WHERE c.vec_id <> 0 AND "
        f"({any_table_ball_sql('c', 'qs', n_tables, n_planes, radius)})) "
        f"SELECT vec_id, score FROM cand "
        f"ORDER BY score DESC, vec_id LIMIT {k}"
    )


def lsh_near_pairs_sql(
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 3,
    seed: int = 42,
    threshold: float = 0.35,
    id_limit: int | None = None,
) -> str:
    """Oracle for the LSH near-pair entries (``dedup_embedding_lsh``,
    ``ann_rewrite_near_pairs``): same-bucket-in-any-table candidate
    pairs (radius 0 — bucket equality, matching ``lsh_near_pairs``
    and the near-pairs rewrite), exact cosine ≥ threshold verify."""
    scope = (
        f"WHERE vec_id < {id_limit} " if id_limit is not None else ""
    )
    cos = _COS.format(a="a.embedding", b="b.embedding")
    return (
        f"WITH {sigs_cte(dim, n_planes, n_tables, seed)}, "
        f"scoped AS (SELECT * FROM sigs {scope}), "
        f"pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        f"ROUND({cos}, 4) AS sim FROM scoped a JOIN scoped b "
        f"ON a.vec_id < b.vec_id AND "
        f"({any_table_ball_sql('a', 'b', n_tables, n_planes, 0)}) "
        f"WHERE {cos} >= {threshold}) "
        f"SELECT id_a, id_b, sim FROM pairs"
    )


def knn_join_sql(
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 3,
    seed: int = 42,
    radius: int = 1,
    k: int = 5,
    query_limit: int = 10,
) -> str:
    """Oracle for ``ann_knn_join``: per query row (vec_id <
    query_limit), Hamming-ball candidates from any table, self
    excluded, exact cosine window top-k (unrounded ordering, id
    tie-break — matching ``optimizer.knn_join``)."""
    cos = _COS.format(a="c.embedding", b="q.embedding")
    return (
        f"WITH {sigs_cte(dim, n_planes, n_tables, seed)}, "
        f"q AS (SELECT * FROM sigs WHERE vec_id < {query_limit}), "
        f"cand AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id, "
        f"{cos} AS raw FROM q JOIN sigs c ON q.vec_id <> c.vec_id "
        f"AND ({any_table_ball_sql('q', 'c', n_tables, n_planes, radius)})), "
        f"rk AS (SELECT q_id, vec_id, ROUND(raw, 4) AS score, "
        f"ROW_NUMBER() OVER (PARTITION BY q_id "
        f"ORDER BY raw DESC, vec_id) AS rank FROM cand) "
        f"SELECT q_id, vec_id, score, rank FROM rk WHERE rank <= {k}"
    )


def ivf_topk_sql(
    dim: int = 64,
    n_probe: int = 3,
    k: int = 5,
    train_mod: int = 4,
) -> str:
    """Oracle for ``ann_ivf_topk`` with fixed-point label-seeded
    centroids: coordinates quantize to floor(x·2^20); a cell's
    centroid is the EXACT integer floor((Σ xq)·256 / n) per
    dimension; assignment/probe ranking is the exact int64 dot —
    engine-independent end to end, with one float op (the final
    cosine re-rank, already oracle-proven by op44)."""
    xq = xq_sql()
    cos = _COS.format(a="e.embedding", b="qv.embedding")
    return (
        f"WITH xq AS (SELECT vec_id, label, {xq} AS q FROM embeddings), "
        f"tr AS (SELECT * FROM xq WHERE vec_id % {train_mod} = 0), "
        f"cs AS (SELECT label, i, SUM(q[i + 1]) AS s, COUNT(*) AS n "
        f"FROM tr CROSS JOIN UNNEST(RANGE(0, {dim})) AS r(i) "
        f"GROUP BY label, i), "
        # exact floor division via nonneg mod: (a - pmod(a, n)) / n
        f"cq AS (SELECT label, i, CAST((s*256 - ((s*256 % n + n) % n)) / n "
        f"AS BIGINT) AS c FROM cs), "
        f"dots AS (SELECT x.vec_id, c.label AS cell, "
        f"SUM(x.q[c.i + 1] * c.c) AS d FROM xq x CROSS JOIN cq c "
        f"WHERE x.vec_id <> 0 GROUP BY x.vec_id, c.label), "
        f"asg AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, "
        f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) "
        f"AS rn FROM dots) WHERE rn = 1), "
        f"qd AS (SELECT c.label AS cell, SUM(x.q[c.i + 1] * c.c) AS d "
        f"FROM (SELECT q FROM xq WHERE vec_id = 0) x CROSS JOIN cq c "
        f"GROUP BY c.label), "
        f"probe AS (SELECT cell FROM (SELECT cell, ROW_NUMBER() OVER "
        f"(ORDER BY d DESC, cell) AS rn FROM qd) WHERE rn <= {n_probe}), "
        f"qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0) "
        f"SELECT e.vec_id, ROUND({cos}, 4) AS score "
        f"FROM embeddings e JOIN asg USING (vec_id) "
        f"JOIN probe ON asg.cell = probe.cell, qv "
        f"ORDER BY ROUND({cos}, 4) DESC, e.vec_id LIMIT {k}"
    )


def ivf_topk_filtered_sql(
    dim: int = 64,
    k: int = 5,
    train_mod: int = 4,
    n_probe_min: int = 4,
    oversample: int = 4,
    pred_sql: str = "vec_id % 7 = 3",
) -> str:
    """Oracle for ``ann_ivf_topk_filtered`` — metadata-filtered IVF
    with PRE-filter semantics (filter the candidate fetch, then
    rank — never post-filter an unfiltered top-k) and deterministic
    probe widening: rank cells by the exact int64 query dot, take
    the shortest prefix whose cumulative FILTERED member count
    reaches ``k·oversample`` (all cells if the filter is tighter
    than that), floored at ``n_probe_min`` (the recall-tuned base
    probe count of the unfiltered entry).  Quantizer/assignment CTEs
    are byte-shared with :func:`ivf_topk_sql`; the widening rule is
    a cumulative-sum window over cell rank, so both engines pick the
    identical probe set.  ``pred_sql`` is a predicate over the
    ``embeddings`` row alias ``e``."""
    xq = xq_sql()
    cos = _COS.format(a="e.embedding", b="qv.embedding")
    target = k * oversample
    return (
        f"WITH xq AS (SELECT vec_id, label, {xq} AS q FROM embeddings), "
        f"tr AS (SELECT * FROM xq WHERE vec_id % {train_mod} = 0), "
        f"cs AS (SELECT label, i, SUM(q[i + 1]) AS s, COUNT(*) AS n "
        f"FROM tr CROSS JOIN UNNEST(RANGE(0, {dim})) AS r(i) "
        f"GROUP BY label, i), "
        f"cq AS (SELECT label, i, CAST((s*256 - ((s*256 % n + n) % n)) / n "
        f"AS BIGINT) AS c FROM cs), "
        f"dots AS (SELECT x.vec_id, c.label AS cell, "
        f"SUM(x.q[c.i + 1] * c.c) AS d FROM xq x CROSS JOIN cq c "
        f"WHERE x.vec_id <> 0 GROUP BY x.vec_id, c.label), "
        f"asg AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, "
        f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) "
        f"AS rn FROM dots) WHERE rn = 1), "
        # the pre-filter: predicate applied to the ASSIGNMENT rows
        # (the index), before any ranking
        f"fasg AS (SELECT a.vec_id, a.cell FROM asg a "
        f"JOIN embeddings e ON a.vec_id = e.vec_id WHERE e.{pred_sql}), "
        f"qd AS (SELECT c.label AS cell, SUM(x.q[c.i + 1] * c.c) AS d "
        f"FROM (SELECT q FROM xq WHERE vec_id = 0) x CROSS JOIN cq c "
        f"GROUP BY c.label), "
        f"ranked AS (SELECT cell, ROW_NUMBER() OVER "
        f"(ORDER BY d DESC, cell) AS rn FROM qd), "
        f"cum AS (SELECT r.rn, r.cell, SUM(COALESCE(f.cnt, 0)) "
        f"OVER (ORDER BY r.rn) AS cum FROM ranked r LEFT JOIN "
        f"(SELECT cell, COUNT(*) AS cnt FROM fasg GROUP BY cell) f "
        f"USING (cell)), "
        f"need AS (SELECT COALESCE("
        f"(SELECT MIN(rn) FROM cum WHERE cum >= {target}), "
        f"(SELECT MAX(rn) FROM cum)) AS p), "
        f"probe AS (SELECT cell FROM cum, need "
        f"WHERE rn <= GREATEST(p, {n_probe_min})), "
        f"qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0) "
        f"SELECT e.vec_id, ROUND({cos}, 4) AS score "
        f"FROM embeddings e JOIN fasg USING (vec_id) "
        f"JOIN probe ON fasg.cell = probe.cell, qv "
        f"ORDER BY ROUND({cos}, 4) DESC, e.vec_id LIMIT {k}"
    )
