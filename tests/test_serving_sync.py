"""Triggered streaming maintenance of the SERVING indexes: an
availableNow stream over the change feed folds commits into the
pinned NSW layout via serving_refresh_fn; sync ≡ direct refreshes,
re-running the sync is a no-op, and served queries see the result.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.operators.graph_ann import (
    build_nsw_index,
)
from pdf_etl_ocr_inference_spark.operators.serving import (
    serve_topk,
    serving_refresh_fn,
)
from pdf_etl_ocr_inference_spark.optimizer import sync_index_from_feed
from pdf_etl_ocr_inference_spark.streaming.changefeed import commit_changes


def _vecs(spark, ids, shift=0.0):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 + shift for j in range(8)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_stream_sync_maintains_serving_index(spark, tmp_path):
    path = str(tmp_path / "graph")
    feed = str(tmp_path / "feed")
    corpus = _vecs(spark, range(40))
    build_nsw_index(spark, corpus, path, n_shards=4, m_neighbors=4)

    # two commits: v1 inserts 100..103 (shifted => unique embeddings,
    # no cosine-1.0 tie with the base corpus's mod-11 classes),
    # v2 deletes 8
    commit_changes(
        _vecs(spark, [100, 101, 102, 103], shift=2.5).withColumn(
            "_change_type", F.lit("insert")
        ),
        feed,
        1,
    )
    commit_changes(
        _vecs(spark, [8]).withColumn("_change_type", F.lit("delete")),
        feed,
        2,
    )
    change_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("_change_type", T.StringType()),
        ]
    )
    sync_index_from_feed(
        spark,
        feed,
        "serving/nsw",
        change_schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        refresh_fn=serving_refresh_fn(path, "nsw"),
    )

    import json

    with open(f"{path}/_nsw_meta.json") as f:
        assert json.load(f)["last_version"] == 2

    # the synced graph equals a fresh build of the post-change corpus
    post = corpus.filter(F.col("vec_id") != 8).unionByName(
        _vecs(spark, [100, 101, 102, 103], shift=2.5)
    )
    full = str(tmp_path / "full")
    build_nsw_index(spark, post, full, n_shards=4, m_neighbors=4)
    canon = lambda p: sorted(  # noqa: E731
        (r["vec_id"], tuple(sorted(r["neighbors"])))
        for r in spark.read.parquet(p).collect()
    )
    assert canon(path) == canon(full)

    # served query reflects the synced state (version-keyed cache)
    q = [
        float(v)
        for v in _vecs(spark, [100], shift=2.5).first()["embedding"]
    ]
    got = serve_topk(spark, path, [(0, q)], k=3, kind="nsw").collect()
    assert 100 in {r["vec_id"] for r in got}
    # and the deleted vector can no longer be served anywhere
    q8 = [float(v) for v in _vecs(spark, [8]).first()["embedding"]]
    got8 = serve_topk(spark, path, [(0, q8)], k=10, kind="nsw").collect()
    assert 8 not in {r["vec_id"] for r in got8}

    # re-running the sync ingests nothing new (checkpoint) and folds
    # nothing (version watermark) — state unchanged
    sync_index_from_feed(
        spark,
        feed,
        "serving/nsw",
        change_schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        refresh_fn=serving_refresh_fn(path, "nsw"),
    )
    assert canon(path) == canon(full)
