"""The similarity top-k rewrite rule (optimizer.py):

- plan match: the rewritten PHYSICAL plan probes signature partitions
  (PartitionFilters on the index scan) and never touches the corpus;
- guard rails: no hint / no index / wrong shape / wrong dim → the
  original plan is returned untouched;
- semantics: rewritten results are a SUBSET of the corpus with exact
  scores (every returned (id, score) matches brute force), and
  recall@k hits 1.0 in the design regime (clustered near-dup vectors).
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.similarity import topk_exact
from pdf_etl_ocr_inference_spark.optimizer import (
    IndexCatalog,
    build_lsh_index,
    optimize,
    rewrite_similarity_topk,
)

from .conftest import SF0001


def _explain(spark, df, mode: str = "formatted") -> str:
    return spark._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.fixture()
def corpus(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet")


@pytest.fixture()
def indexed(spark, corpus, tmp_path):
    """LSH index over the sf0.001 embeddings in an isolated catalog."""
    cat = IndexCatalog(root=str(tmp_path / "idx"))
    key = "test/embeddings"
    build_lsh_index(
        spark, corpus, key, id_col="vec_id", embedding_col="embedding",
        n_planes=8, seed=42, catalog=cat,
    )
    return cat, key


def _qvec(corpus):
    return [
        float(v)
        for v in corpus.filter(F.col("vec_id") == 0).first()["embedding"]
    ]


def test_rewrite_probes_partitions_not_corpus(spark, corpus, indexed):
    cat, key = indexed
    qvec = _qvec(corpus)
    brute = topk_exact(
        corpus, "embedding", qvec, k=5, table_key=key, exclude_ids=[0]
    )
    opt = rewrite_similarity_topk(brute, catalog=cat)
    plan = _explain(spark, opt)
    # bucket probe: partition pruning on the signature, index scan only
    assert "PartitionFilters" in plan
    assert "_sig" in plan
    assert "embeddings.parquet" not in plan  # corpus never scanned
    # brute force, by contrast, scans the corpus with no _sig pruning
    brute_plan = _explain(spark, brute)
    assert "embeddings.parquet" in brute_plan


def test_rewrite_requires_hint_index_and_shape(spark, corpus, indexed):
    cat, key = indexed
    qvec = _qvec(corpus)
    # no hint (no table_key) → unchanged object
    plain = topk_exact(corpus, "embedding", qvec, k=5)
    assert rewrite_similarity_topk(plain, catalog=cat) is plain
    # hinted but index catalog has no entry for the key → unchanged
    hinted_unknown = topk_exact(
        corpus, "embedding", qvec, k=5, table_key="nope/missing"
    )
    assert rewrite_similarity_topk(hinted_unknown, catalog=cat) is hinted_unknown
    # hinted but the top-k shape was broken (extra filter ABOVE the
    # limit changes semantics) → unchanged
    broken = topk_exact(
        corpus, "embedding", qvec, k=5, table_key=key
    ).filter(F.col("vec_id") > 3)
    assert rewrite_similarity_topk(broken, catalog=cat) is broken
    # ascending re-sort (not a "top"-k anymore) → unchanged
    asc = (
        topk_exact(corpus, "embedding", qvec, k=5, table_key=key)
        .orderBy("score")
        .limit(3)
    )
    assert rewrite_similarity_topk(asc, catalog=cat) is asc
    # dimension mismatch vs the registered index → unchanged
    wrong_dim = topk_exact(
        corpus, "embedding", [1.0, 2.0], k=5, table_key=key
    )
    assert rewrite_similarity_topk(wrong_dim, catalog=cat) is wrong_dim


def test_rewrite_scores_are_exact_subset(spark, corpus, indexed):
    """Every (id, score) the rewritten plan returns must equal the
    brute-force score for that id — the probe changes WHICH rows are
    considered, never their scores (no false positives)."""
    cat, key = indexed
    qvec = _qvec(corpus)
    opt = optimize(
        topk_exact(
            corpus, "embedding", qvec, k=10, table_key=key, exclude_ids=[0]
        ),
        catalog=cat,
    )
    got = {r["vec_id"]: r["score"] for r in opt.collect()}
    assert 0 < len(got) <= 10 and 0 not in got
    full = {
        r["vec_id"]: r["score"]
        for r in topk_exact(
            corpus, "embedding", qvec, k=600, exclude_ids=[0]
        ).collect()
    }
    for vid, score in got.items():
        assert full[vid] == pytest.approx(score, abs=1e-4)


def test_rewrite_recall_in_design_regime(spark, tmp_path):
    """Clustered corpus (true near-dups, cos >= ~0.95): the probe must
    recover the exact top-k perfectly — sign-LSH disagreement decays
    with the angle, and radius-2 multi-probe covers the residue."""
    rng = random.Random(7)
    dim = 32

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def randv():
        return unit([rng.gauss(0, 1) for _ in range(dim)])

    base = randv()

    def near(v, eps):
        return unit([x + rng.gauss(0, eps) for x in v])

    # eps=0.02 per coordinate → noise norm ≈ 0.11 → cos ≈ 0.994
    # (a TRUE near-dup; eps=0.12 would give cos≈0.83, outside the
    # regime where radius-2 multi-probe guarantees recovery)
    rows = [(0, base)] + [(i, near(base, 0.02)) for i in range(1, 6)]
    rows += [(i, randv()) for i in range(6, 200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cat = IndexCatalog(root=str(tmp_path / "idx2"))
    key = "test/clustered"
    build_lsh_index(
        spark, df, key, id_col="vec_id", embedding_col="embedding",
        n_planes=8, seed=42, catalog=cat,
    )
    exact = [
        r["vec_id"]
        for r in topk_exact(
            df, "embedding", base, k=5, exclude_ids=[0]
        ).collect()
    ]
    assert set(exact) == {1, 2, 3, 4, 5}  # sanity: cluster dominates
    opt = optimize(
        topk_exact(
            df, "embedding", base, k=5, table_key=key, exclude_ids=[0]
        ),
        catalog=cat,
    )
    got = [r["vec_id"] for r in opt.collect()]
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall == 1.0, f"recall {recall}: {got} vs {exact}"
