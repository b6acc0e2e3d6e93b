"""SemDeDup operator: within-cluster pair kernel vs a numpy brute
force, subset/zero-false-positive properties of the k-means path,
and the greedy keep-lowest-index drop policy."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.operators.semantic_dedup import (
    semantic_dedup,
    semantic_near_pairs,
)

SF = "/root/testdata/sf0.001"
TAU = 0.3


def _load(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _brute_pairs(rows, tau, key=None):
    """All (id_a, id_b, sim) with sim >= tau; ``key`` scopes pairs to
    equal-key blocks (the clustering)."""
    out = {}
    ids = [r["vec_id"] for r in rows]
    V = np.stack([np.asarray(r["embedding"], dtype="float64") for r in rows])
    norms = np.sqrt((V * V).sum(axis=1))
    norms[norms == 0] = 1.0
    V = V / norms[:, None]
    S = V @ V.T
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if key is not None and key[i] != key[j]:
                continue
            if S[i, j] >= tau:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = S[i, j]
    return out


def test_pairs_match_bruteforce_within_label(spark):
    emb = _load(spark)
    rows = emb.collect()
    labels = [r["label"] for r in rows]
    want = _brute_pairs(rows, TAU, key=labels)
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in semantic_near_pairs(
            emb, "embedding", "vec_id", "label", TAU
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_kmeans_pairs_subset_of_global_no_false_positives(spark):
    from pdf_etl_ocr_inference_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )

    emb = _load(spark)
    res = kmeans_fit(emb, "embedding", "vec_id", k=4, rounds=2)
    assigned = assign_clusters(emb, "embedding", res.centroids)
    got = semantic_near_pairs(
        assigned, "embedding", "vec_id", "cluster_id", TAU
    ).collect()
    glob = _brute_pairs(emb.collect(), TAU)  # unrestricted pairs
    for r in got:
        # clustering only RESTRICTS the candidate set — every emitted
        # pair must be a true global near pair (zero false positives)
        assert (r["id_a"], r["id_b"]) in glob
        assert r["sim"] == pytest.approx(glob[(r["id_a"], r["id_b"])], rel=1e-9)


def _tiny(spark, vecs):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("c", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)], schema
    )


def test_greedy_drop_policy_chain(spark):
    # a~b and b~c near, a~c not: greedy keep-lowest-index drops BOTH
    # b and c (b has lower near-neighbor a; c has lower near-neighbor
    # b) — the documented SemDeDup policy, not transitive closure.
    a = [1.0, 0.0]
    b = [float(np.cos(0.45)), float(np.sin(0.45))]  # cos(a,b) ~ 0.90
    c = [float(np.cos(0.90)), float(np.sin(0.90))]  # cos(b,c) ~ 0.90, a~c 0.62
    df = _tiny(spark, [a, b, c])
    kept = semantic_dedup(df, "embedding", "vec_id", "c", 0.85)
    assert sorted(r["vec_id"] for r in kept.collect()) == [0]


def test_exact_duplicate_dropped_survivor_is_min_id(spark):
    v = [0.6, 0.8]
    far = [-0.8, 0.6]
    df = _tiny(spark, [v, far, v, v])  # ids 0,2,3 identical
    kept = semantic_dedup(df, "embedding", "vec_id", "c", 0.95)
    assert sorted(r["vec_id"] for r in kept.collect()) == [0, 1]


def test_singleton_and_empty_cluster_safe(spark):
    df = _tiny(spark, [[1.0, 0.0]])
    pairs = semantic_near_pairs(df, "embedding", "vec_id", "c", 0.5)
    assert pairs.count() == 0
    kept = semantic_dedup(df, "embedding", "vec_id", "c", 0.5)
    assert kept.count() == 1


def test_collapse_path_equals_full_policy_under_mass_duplication(spark):
    # 300 identical copies + a handful of distinct vectors: the
    # collapse path (reps-only kernel) must return EXACTLY the
    # full-policy survivors, while the pair gemm sees only the
    # distinct vectors instead of a 300x300 block.
    dup = [0.6, 0.8]
    distinct = [
        [float(np.cos(t)), float(np.sin(t))] for t in (0.2, 1.0, 1.8, 2.6)
    ]
    vecs = [dup] * 300 + distinct
    df = _tiny(spark, vecs)
    tau = 0.9
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(df, "embedding", "vec_id", "c", tau).collect()
    )
    # replica of the full greedy policy in numpy
    V = np.array(vecs)
    V = V / np.sqrt((V * V).sum(axis=1))[:, None]
    S = V @ V.T
    want = [
        x
        for x in range(len(vecs))
        if not any(S[x, y] >= tau for y in range(x))
    ]
    assert kept == want
    # the pairs-reuse path agrees too
    pairs = semantic_near_pairs(df, "embedding", "vec_id", "c", tau)
    kept2 = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            df, "embedding", "vec_id", "c", tau, pairs=pairs
        ).collect()
    )
    assert kept2 == want
