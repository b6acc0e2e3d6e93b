"""Metadata-filtered serving (serve_topk's ``predicate`` arg, r11
verdict #1): PRE-filter semantics — the predicate restricts the
candidate fetch and the search WIDENS (ef / rerank / probed cells)
until k survivors pass, so a tight filter reads more of the index
instead of starving or post-filtering a finished top-k.

Ground truth is the brute-force filtered top-k computed driver-side
from the same fixture; with a filter tight enough that widening
reaches the whole index, every kind must EQUAL it exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.graph_ann import build_nsw_index
from pdf_etl_ocr_inference_spark.operators.hnsw import build_hnsw_index
from pdf_etl_ocr_inference_spark.operators.serving import (
    build_ivf_serving_index,
    build_pq_serving_index,
    serve_topk,
)

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _qvec(emb, vid=0):
    return [
        float(v)
        for v in emb.filter(F.col("vec_id") == vid).first()["embedding"]
    ]


def _exact_filtered(emb, qvec, pred, k=5):
    """Driver-side brute-force filtered cosine top-k (the ground
    truth every filtered path is compared against)."""
    rows = emb.filter(F.col("vec_id") != 0).collect()
    q = np.asarray(qvec, dtype="float64")
    q = q / np.sqrt(q @ q)
    scored = []
    for r in rows:
        i = int(r["vec_id"])
        if not pred(i):
            continue
        v = np.asarray(r["embedding"], dtype="float64")
        n = float(np.sqrt(v @ v))
        scored.append((i, float(v @ q) / n if n > 0 else 0.0))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return [(i, round(s, 4)) for i, s in scored[:k]]


def _served(spark, path, qvec, kind, pred, k=5, **kw):
    return [
        (int(r["vec_id"]), float(r["score"]))
        for r in serve_topk(
            spark, path, [(0, qvec)], k=k, kind=kind,
            exclude_ids=[0], predicate=pred, **kw,
        )
        .orderBy(F.desc("score"), "vec_id")
        .collect()
    ]


def test_filtered_hnsw_tight_filter_widens_to_exact(spark, tmp_path):
    emb = _corpus(spark)
    path = str(tmp_path / "hnsw")
    build_hnsw_index(spark, emb, path, n_shards=4, m_neighbors=8)
    qvec = _qvec(emb)
    # ~1% selectivity: far tighter than ef_search=8 would cover —
    # only beam widening (up to the shard size) can find them all
    pred = lambda i: i % 97 == 3  # noqa: E731
    got = _served(spark, path, qvec, "hnsw", pred, ef_search=8)
    want = _exact_filtered(emb, qvec, lambda i: i % 97 == 3 and i != 0)
    assert got == want
    assert all(i % 97 == 3 for i, _ in got)


def test_filtered_nsw_matches_exact_on_tight_filter(spark, tmp_path):
    emb = _corpus(spark)
    path = str(tmp_path / "nsw")
    build_nsw_index(spark, emb, path, n_shards=4, m_neighbors=8)
    qvec = _qvec(emb)
    pred = lambda i: i % 97 == 3  # noqa: E731
    got = _served(spark, path, qvec, "nsw", pred, ef_search=8)
    want = _exact_filtered(emb, qvec, lambda i: i % 97 == 3 and i != 0)
    assert got == want


def test_filtered_pq_widens_rerank_window(spark, tmp_path):
    from pdf_etl_ocr_inference_spark.operators.pq import (
        train_pq_codebooks,
    )

    emb = _corpus(spark)
    books = train_pq_codebooks(emb, "embedding", "vec_id", m=8, k=16)
    path = str(tmp_path / "pq")
    build_pq_serving_index(spark, emb, path, books, n_shards=2)
    qvec = _qvec(emb)
    # 6 survivors corpus-wide (< k per shard): the ADC window must
    # double until it covers each WHOLE shard, where the re-rank
    # degenerates to an exact scan → strict equality (a looser
    # filter would stop widening at k ADC-ordered survivors, which
    # is legitimately approximate — same caveat as unfiltered PQ)
    pred = lambda i: i % 97 == 3  # noqa: E731
    got = _served(spark, path, qvec, "pq", pred, rerank=6)
    want = _exact_filtered(emb, qvec, lambda i: i % 97 == 3 and i != 0)
    assert got == want


def test_filtered_ivf_probe_widening_reaches_all_survivors(
    spark, tmp_path
):
    emb = _corpus(spark)
    # a handful of corpus vectors as coarse centroids — cell quality
    # is irrelevant here, the widening contract is what's under test
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(
            F.col("vec_id").isin([1, 2, 3, 4, 5, 6, 7, 8])
        )
        .orderBy("vec_id")
        .collect()
    ]
    path = str(tmp_path / "ivf")
    build_ivf_serving_index(spark, emb, path, cents)
    qvec = _qvec(emb)
    # 5 survivors total (< k=5 per cell): every cell must end up
    # probed, so the result is EXACTLY the filtered brute force
    pred = lambda i: i % 97 == 3  # noqa: E731
    got = _served(spark, path, qvec, "ivf", pred, n_probe=1)
    want = _exact_filtered(emb, qvec, lambda i: i % 97 == 3 and i != 0)
    assert got == want


def test_filtered_ivf_broad_filter_single_round(spark, tmp_path):
    emb = _corpus(spark)
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin([1, 2, 3])).collect()
    ]
    path = str(tmp_path / "ivf")
    build_ivf_serving_index(spark, emb, path, cents)
    qvec = _qvec(emb)
    got = _served(
        spark, path, qvec, "ivf", lambda i: i % 2 == 1, n_probe=3
    )
    # every returned id satisfies the predicate, and k rows came back
    assert len(got) == 5
    assert all(i % 2 == 1 for i, _ in got)


def test_predicate_none_unchanged(spark, tmp_path):
    """predicate=None must ride the original single-job path and
    return the same rows as before the predicate arg existed."""
    emb = _corpus(spark)
    path = str(tmp_path / "hnsw")
    build_hnsw_index(spark, emb, path, n_shards=4, m_neighbors=8)
    qvec = _qvec(emb)
    a = _served(spark, path, qvec, "hnsw", None)
    b = [
        (int(r["vec_id"]), float(r["score"]))
        for r in serve_topk(
            spark, path, [(0, qvec)], k=5, kind="hnsw", exclude_ids=[0]
        )
        .orderBy(F.desc("score"), "vec_id")
        .collect()
    ]
    assert a == b
