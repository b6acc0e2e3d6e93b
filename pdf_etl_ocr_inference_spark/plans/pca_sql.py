"""Lazy DuckDB oracle for ``ann_pca_project``.

DuckDB has no eigendecomposition, so the eigh itself cannot be a SQL
replay — but the DATA PLANE can (the r7 verdict's ask): the oracle
generator independently recomputes the engine's exact integer Gram
pass straight from the parquet (numpy, no Spark), runs the SAME
shared eigh code path (``operators/pca.eigh_from_ints`` — identical
integers in, bit-identical components out), quantizes the rotation
and mean with ``quantize_pca_model``, and emits them as INTEGER
LITERALS in a SQL string that replays the distributed projection:

    xq_j = floor(x_j·2^20)      (exact for any double)
    r_j  = xq_j − mq_j          (exact int)
    P_i  = Σ_j r_j·cq_ij        (exact int64, |P| ≪ 2^53)
    pc_i = P_i / 2^40           (one division of an exact integer —
                                 correctly rounded, engine-identical)

So the gate now verifies by value everything distributed about the
entry — quantization, centering, the 4×64 integer dot products, the
final division — while the eigh stays covered by the orthonormality/
partition-invariance property tests (tests/test_pca.py).

The oracle is a ZERO-ARG CALLABLE (plans/registry.resolve_oracle):
the literals depend on the corpus, so the SQL is generated at
``oracle_sql()`` time against ``SPARK_GRAFT_ORACLE_SF_DIR`` (default
the driver's sf0.01; tools/run_gate.py pins it to its --sf).
"""

from __future__ import annotations

import os

_SCALE = 1 << 20  # matches operators/pca._SCALE

_DEFAULT_SF = "/root/testdata/sf0.01"


def _corpus_model(sf_dir: str, k: int):
    """(cq, mq) from a direct parquet replay of the integer Gram pass
    — numpy int64 matmul (bounds-asserted), shared eigh."""
    import duckdb
    import numpy as np

    from pdf_etl_ocr_inference_spark.operators.pca import (
        eigh_from_ints,
        quantize_pca_model,
    )

    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    xq = np.floor(mat * _SCALE).astype(np.int64)
    n, d = xq.shape
    # int64 Gram is exact iff n·max(xq)² < 2^63 — true by orders of
    # magnitude for the fixtures (|x| ≤ 1-ish); assert, don't assume
    peak = int(np.abs(xq).max())
    assert n * peak * peak < (1 << 62), "oracle gram would overflow"
    sums = [int(v) for v in xq.sum(axis=0)]
    gram = [int(v) for v in (xq.T @ xq).ravel()]
    comps, _evals = eigh_from_ints(n, sums, gram, k)
    return quantize_pca_model(n, sums, comps)


def pca_project_oracle(k: int = 4) -> str:
    """Generate the projection-replay SQL with quantized literals."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", _DEFAULT_SF)
    cq, mq = _corpus_model(sf_dir, k)
    div = float(_SCALE) ** 2
    pcs = []
    for i, row in enumerate(cq):
        terms = " + ".join(
            f"(q[{j + 1}] - ({mq[j]})) * ({row[j]})"
            for j in range(len(row))
        )
        pcs.append(f"CAST({terms} AS DOUBLE) / {div!r} AS pc{i}")
    return (
        "WITH xq AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(FLOOR(x::DOUBLE * {float(_SCALE)!r}) AS BIGINT)) AS q "
        "FROM embeddings) "
        f"SELECT vec_id, {', '.join(pcs)} FROM xq"
    )
