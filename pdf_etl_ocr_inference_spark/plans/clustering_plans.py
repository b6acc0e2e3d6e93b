"""Corpus-clustering catalog: deterministic k-means domain discovery
over the embeddings table, plus epoch-replication data mixing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.clustering import (
    assign_clusters,
    init_centroids,
    kmeans_fit,
)
from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t

_K = 8




@register(
    "ann_kmeans_assign",
    f"""
    WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id < {_K}),
    d AS (SELECT e.vec_id, c.cid,
                 LIST_DISTANCE(e.embedding::DOUBLE[], c.ce) AS dist
          FROM embeddings e CROSS JOIN c),
    r AS (SELECT vec_id, cid, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d)
    SELECT vec_id, cid AS cluster_id FROM r WHERE rn = 1
    """,
    doc="nearest-centroid assignment (k-means round 0: centroids = the "
    f"{_K} lowest-id vectors): argmin squared-L2 with ties to the "
    "lowest cluster id. The assignment pass is k fused aggregate "
    "expressions per row — no crossJoin row blowup, no UDF — so it "
    "scans the corpus once per Lloyd round at any scale.",
)
def ann_kmeans_assign(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    centroids = init_centroids(emb, "embedding", "vec_id", _K)
    return assign_clusters(emb, "embedding", centroids).select(
        "vec_id", F.col("cluster_id").cast("long").alias("cluster_id")
    )


@register(
    "ann_kmeans_clusters",
    None,  # iterative float means are not SQL-expressible in one query;
    # determinism + parity vs an exact numpy replica in
    # tests/test_clustering.py
    doc="full deterministic k-means (5 Lloyd rounds, exact int64 "
    "centroid sums so results are partition-order independent): "
    "per-cluster size and mean squared distance. Row count is always "
    "k, stable across SFs and reruns.",
)
def ann_kmeans_clusters(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    result = kmeans_fit(emb, "embedding", "vec_id", k=_K, rounds=5)
    assigned = assign_clusters(emb, "embedding", result.centroids)
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("sq_dist"), 4).alias("mean_sq_dist"),
        )
        .select(
            F.col("cluster_id").cast("long").alias("cluster_id"),
            "n_vecs",
            "mean_sq_dist",
        )
    )


_EPOCHS = {"web": 1, "books": 3, "wiki": 2}


@register(
    "train_epoch_replication",
    "SELECT source, COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_docs "
    "FROM (SELECT doc_id, source, UNNEST(GENERATE_SERIES(1, CASE source "
    + " ".join(f"WHEN '{s}' THEN {e}" for s, e in sorted(_EPOCHS.items()))
    + " ELSE 1 END)) AS epoch FROM documents) GROUP BY source",
    doc="multi-epoch data mixing: upsample sources by integer epoch "
    "counts (books 3x, wiki 2x) via explode(sequence(1, n)) — the "
    "replication happens executor-side after the scan, so a 3-epoch "
    "source is never re-read three times, and downstream shuffles see "
    "the replicated stream. Complements train_mix_weighted's "
    "downsampling quotas.",
)
def train_epoch_replication(spark: SparkSession, sf: str) -> DataFrame:
    epochs = F.create_map(
        *[F.lit(x) for se in sorted(_EPOCHS.items()) for x in se]
    )
    n = F.coalesce(epochs[F.col("source")], F.lit(1))
    return (
        _t(spark, sf, "documents")
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), n)))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


_PCA_DIMS = 8
_PCA_PAIRS = ", ".join(
    f"({i}, {j})"
    for i in range(_PCA_DIMS)
    for j in range(_PCA_DIMS)
    if i <= j
)


@register(
    "ann_pca_gram",
    "SELECT p.i AS i, p.j AS j, "
    "CAST(SUM("
    "CAST(FLOOR(list_extract(embedding, p.i + 1)::DOUBLE * 1048576.0) AS BIGINT) * "
    "CAST(FLOOR(list_extract(embedding, p.j + 1)::DOUBLE * 1048576.0) AS BIGINT)"
    ") AS BIGINT) AS s "
    f"FROM embeddings CROSS JOIN (VALUES {_PCA_PAIRS}) AS p(i, j) "
    "GROUP BY p.i, p.j",
    doc="the ORACLED slice of the deterministic PCA covariance pass: "
    "integer-exact upper-triangle Gram sums of floor(x*2^20)-"
    "quantized embeddings over the first 8 dims — the exact "
    "integers the full-dim fit aggregates, replayed value-for-"
    "value by DuckDB (floor + IEEE double multiply are bit-"
    "identical across engines; round() would not be). One narrow "
    "mapInPandas pass, one tiny partial per partition "
    "(operators/pca.py).",
)
def ann_pca_gram(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.pca import gram_table

    return gram_table(_t(spark, sf, "embeddings"), "embedding", _PCA_DIMS)


@register(
    "ann_pca_project",
    None,  # eigendecomposition is a driver step → rows-only;
    # numpy-replica parity + partition-invariance in tests/test_pca.py
    doc="deterministic distributed PCA: integer-exact quantized "
    "covariance (one narrow pass, partition-count-sized driver "
    "traffic), driver eigh with sign canonicalization, Arrow-"
    "batched projection onto the broadcast top-4 components. "
    "Bit-identical for ANY partitioning of the corpus "
    "(operators/pca.py).",
)
def ann_pca_project(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.pca import (
        fit_pca,
        project_pca,
    )

    emb = _t(spark, sf, "embeddings")
    comps, _evals, mean = fit_pca(emb, "embedding", k=4)
    return project_pca(emb, "embedding", "vec_id", comps, mean)
