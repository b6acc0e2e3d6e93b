"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540 — public method): partition embeddings into
clusters (k-means, or any precomputed cluster column), then search
for near-duplicate pairs ONLY within each cluster (cosine >=
threshold), dropping every member that has a lower-id near neighbor
in its own cluster.

Scale shape: the quadratic pair kernel runs per cluster — Σ cᵢ²
work instead of n² — and ``k`` is the knob that bounds cluster
sizes (SemDeDup used k ≈ √n on LAION-scale corpora).  Each kernel
is ONE dense matmul over the cluster's stacked unit vectors inside
``applyInPandas`` (Arrow batch in, numpy BLAS, Arrow batch out), so
the Python cost per cluster is a single gemm, not a pair loop.  At
100 TB the clusters shuffle once on ``cluster_col`` and never meet
each other again.

Drop policy (deterministic, SemDeDup's keep-lowest-index greedy): a
member is dropped iff SOME lower-id member of the same cluster is
within the threshold.  Chains behave greedily — for a~b, b~c
(a<b<c) both b and c drop even when a~c is below threshold; this is
the published policy, not transitive-closure clustering (the
engine's connected-components dedup covers that semantics).

Reference anchor: ocr-tesseract-unstructured.py:145-170 (the
embedding-similarity surface this composes with k-means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("cluster_id", T.LongType()),
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ]
)


def semantic_near_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cluster_col: str,
    threshold: float,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (cluster_id, id_a, id_b,
    sim) with ``id_a < id_b`` and cosine ``sim >= threshold``.

    Exact within the cluster (the only approximation in the SemDeDup
    pipeline is the clustering itself): unit-normalize the cluster's
    vectors, one S = V·Vᵀ gemm, mask the upper triangle — zero false
    positives by construction.
    """
    import numpy as np
    import pandas as pd

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy().astype("int64")
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"cluster_id": [], "id_a": [], "id_b": [], "sim": []}
            ).astype(
                {
                    "cluster_id": "int64",
                    "id_a": "int64",
                    "id_b": "int64",
                    "sim": "float64",
                }
            )
        V = np.stack(
            [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
        )
        norms = np.sqrt(np.einsum("ij,ij->i", V, V))
        nz = norms > 0
        V[nz] = V[nz] / norms[nz, None]
        S = V @ V.T
        ia, ib = np.triu_indices(n, 1)
        keep = S[ia, ib] >= threshold
        ia, ib = ia[keep], ib[keep]
        cid = int(pdf[cluster_col].iloc[0])
        return pd.DataFrame(
            {
                "cluster_id": np.full(len(ia), cid, dtype="int64"),
                "id_a": ids[ia],
                "id_b": ids[ib],
                "sim": S[ia, ib],
            }
        )

    return df.groupBy(cluster_col).applyInPandas(_pairs, PAIRS_SCHEMA)


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cluster_col: str,
    threshold: float,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Survivors of the greedy keep-lowest-index policy.

    Mass-duplication guard (the LSH hot-bucket lesson): identical
    embedding vectors are pairwise sim-1 cliques that all land in ONE
    cluster no matter how large ``k`` is, so d copies would put a
    d×d block through the pair gemm.  Collapse each (cluster,
    vector)-identical group to its min-id representative FIRST — the
    kernel then sees only distinct vectors.  This is EXACT, not an
    approximation: a non-min clique member always has a lower-id
    sim-1 neighbor (its rep) and so always drops (any threshold
    ≤ 1); and a rep r drops under the full policy iff some lower-id
    row y has sim ≥ threshold, in which case y's own rep (≤ y < r,
    identical vector to y) is a lower-id REP witness — so the greedy
    verdict over reps alone equals the verdict over all rows.

    Pass precomputed ``pairs`` (over the FULL df) to reuse a pair
    scan instead; both paths return the same survivor set.
    """
    if pairs is not None:
        dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return df.join(dropped, id_col, "left_anti")
    reps = df.groupBy(cluster_col, vec_col).agg(
        F.min(id_col).alias(id_col)
    )
    rep_pairs = semantic_near_pairs(
        reps, vec_col, id_col, cluster_col, threshold
    )
    kept = reps.join(
        rep_pairs.select(F.col("id_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    ).select(id_col)
    return df.join(kept, id_col, "left_semi")
