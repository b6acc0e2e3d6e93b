"""Deterministic k-means (operators/clustering.py) vs an exact numpy
replica of the same algorithm (same init, same int64-scaled centroid
sums, same argmin tie-breaking) — the two must agree on assignments
exactly and on centroids to float-division rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.clustering import (
    SCALE,
    assign_clusters,
    kmeans_fit,
)

SF = "/root/testdata/sf0.001"
K, ROUNDS = 4, 3


def _numpy_kmeans(ids, vecs, k, rounds):
    order = np.argsort(ids, kind="stable")
    centroids = vecs[order[:k]].astype(np.float64).copy()
    scaled = np.rint(vecs.astype(np.float64) * SCALE).astype(np.int64)
    inertia_trace = []
    for _ in range(rounds):
        d2 = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes first min -> lowest id
        inertia_trace.append(float(d2[np.arange(len(vecs)), assign].sum()))
        for ci in range(k):
            members = scaled[assign == ci]
            if len(members):
                centroids[ci] = members.sum(axis=0, dtype=np.int64) / (
                    len(members) * SCALE
                )
        prev_assign = assign
    return centroids, prev_assign, inertia_trace


@pytest.fixture(scope="module")
def emb_arrays():
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(tbl["vec_id"])
    vecs = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    return ids, vecs


def test_matches_numpy_replica(spark, emb_arrays):
    ids, vecs = emb_arrays
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    res = kmeans_fit(emb, "embedding", "vec_id", k=K, rounds=ROUNDS)
    np_centroids, np_assign, _ = _numpy_kmeans(ids, vecs, K, ROUNDS)

    got = np.array(res.centroids)
    assert got.shape == np_centroids.shape
    # centroids derive from exact int sums; only the final float
    # division can differ, and only by one ulp
    np.testing.assert_allclose(got, np_centroids, rtol=0, atol=1e-12)

    # the distributed assignment under the PREVIOUS round's centroids
    # is what numpy's last `assign` used; recompute with the same ones
    spark_assign = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(emb, "embedding", res.centroids)
        .select("vec_id", "cluster_id")
        .collect()
    }
    d2 = ((vecs[:, None, :] - got[None, :, :]) ** 2).sum(axis=2)
    expect = d2.argmin(axis=1)
    for i, vid in enumerate(ids):
        assert spark_assign[int(vid)] == expect[i]


def test_inertia_monotone_and_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    r1 = kmeans_fit(emb, "embedding", "vec_id", k=K, rounds=ROUNDS)
    r2 = kmeans_fit(
        emb.repartition(7), "embedding", "vec_id", k=K, rounds=ROUNDS
    )
    # Lloyd never increases inertia
    for a, b in zip(r1.inertia_per_round, r1.inertia_per_round[1:]):
        assert b <= a + 1e-9
    # partition layout must not change anything
    assert r1.centroids == r2.centroids
    assert r1.inertia_per_round == r2.inertia_per_round


def test_empty_cluster_keeps_centroid(spark):
    # vec_id 2 duplicates vec_id 0's vector, so init centroids 0 and 2
    # coincide; the lowest-id tie-break sends every nearby point to
    # cluster 0, leaving cluster 2 empty from round 1 on — it must
    # keep its init centroid instead of collapsing to NaN
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.0, 0.0]),
        (3, [0.1, 0.0]),
        (4, [10.0, 9.9]),
        (5, [0.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # round 1: cluster 2 owns nothing -> keeps [0,0] (no NaN collapse)
    r1 = kmeans_fit(df, "embedding", "vec_id", k=3, rounds=1)
    assert r1.centroids[2] == [0.0, 0.0]
    assert r1.centroids[0] == [0.025, 0.025]  # mean of {0,2,3,5}
    # later rounds: the kept centroid legitimately re-captures the two
    # exact-origin points (closer to [0,0] than to the moved c0)
    res = kmeans_fit(df, "embedding", "vec_id", k=3, rounds=4)
    assert all(all(x == x for x in c) for c in res.centroids)  # no NaN
    assigned = assign_clusters(df, "embedding", res.centroids)
    sizes = {
        r["cluster_id"]: r["n"]
        for r in assigned.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(sizes.values()) == len(rows)
    assert sizes == {0: 2, 1: 2, 2: 2}
