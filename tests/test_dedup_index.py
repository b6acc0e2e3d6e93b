"""Incremental MinHash-LSH dedup index: the probe path must agree
with the batch pipeline, and change-feed folds must be honored.

Fixture corpus plants exact near-dup structure: doc k and doc k+100
share most of their shingles (one word differs), unrelated docs share
none.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.dedup import minhash_dedup_pairs
from pdf_etl_ocr_inference_spark.operators.dedup_index import (
    build_minhash_index,
    dedup_against_index,
    refresh_minhash_index,
)
from pdf_etl_ocr_inference_spark.optimizer import IndexCatalog

THRESH = 0.5


def _doc(i: int, salt: str = "") -> str:
    # 12 distinct words per doc family; family = i % 100
    fam = i % 100
    words = [f"w{fam}x{j}" for j in range(12)]
    if i >= 100:
        words[-1] = f"alt{i}"  # near-dup of family base, not exact
    if salt:
        words[0] = salt
    return " ".join(words)


@pytest.fixture(scope="module")
def corpus(spark):
    # base: ids 0..19 (families 0..19); batch: ids 100..109 — each a
    # near-dup of base id (i-100); ids 110..114 novel families
    rows = [(i, _doc(i)) for i in range(20)]
    rows += [(i, _doc(i)) for i in range(100, 110)]
    rows += [(i, " ".join(f"solo{i}y{j}" for j in range(12))) for i in range(110, 115)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {
        (r.id_a, r.id_b, round(r.jaccard, 4)) for r in df.collect()
    }


def test_incremental_equals_batch_subset(spark, corpus, tmp_path):
    cat = IndexCatalog(root=str(tmp_path))
    batch_ids = {i for (i,) in corpus.select("doc_id").collect() if i >= 100}
    base = corpus.filter(F.col("doc_id") < 100)
    batch = corpus.filter(F.col("doc_id") >= 100)

    build_minhash_index(spark, base, "t/inc", catalog=cat)
    refresh_minhash_index(
        spark,
        "t/inc",
        batch.withColumn("_change_type", F.lit("insert")),
        version=1,
        catalog=cat,
    )
    got = _pairs(
        dedup_against_index(
            spark, "t/inc", batch.select("doc_id", "text"), corpus,
            jaccard_threshold=THRESH, catalog=cat,
        )
    )
    full = _pairs(
        minhash_dedup_pairs(
            corpus, "text", "doc_id", jaccard_threshold=THRESH
        )
    )
    want = {
        p for p in full if p[0] in batch_ids or p[1] in batch_ids
    }
    assert got == want
    assert got, "fixture must actually contain planted near-dups"


def test_tombstones_honored(spark, corpus, tmp_path):
    cat = IndexCatalog(root=str(tmp_path))
    build_minhash_index(spark, corpus.filter(F.col("doc_id") < 100), "t/tomb", catalog=cat)
    batch = corpus.filter(F.col("doc_id") >= 100)
    refresh_minhash_index(
        spark, "t/tomb",
        batch.withColumn("_change_type", F.lit("insert")),
        version=1, catalog=cat,
    )
    # v2: delete base doc 5; rewrite base doc 6 into a novel family
    d5 = corpus.filter(F.col("doc_id") == 5)
    pre6 = corpus.filter(F.col("doc_id") == 6)
    post6 = spark.createDataFrame(
        [(6, " ".join(f"moved6z{j}" for j in range(12)))],
        "doc_id long, text string",
    )
    changes = (
        d5.withColumn("_change_type", F.lit("delete"))
        .unionByName(pre6.withColumn("_change_type", F.lit("update_preimage")))
        .unionByName(post6.withColumn("_change_type", F.lit("update_postimage")))
    )
    refresh_minhash_index(spark, "t/tomb", changes, version=2, catalog=cat)

    # post-state corpus for text resolution
    post_corpus = (
        corpus.filter(~F.col("doc_id").isin(5, 6)).unionByName(post6)
    )
    got = _pairs(
        dedup_against_index(
            spark, "t/tomb", batch.select("doc_id", "text"), post_corpus,
            jaccard_threshold=THRESH, catalog=cat,
        )
    )
    # ground truth: full rebuild on the post-state corpus
    cat2 = IndexCatalog(root=str(tmp_path / "rebuild"))
    build_minhash_index(spark, post_corpus, "t/rebuilt", catalog=cat2)
    want = _pairs(
        dedup_against_index(
            spark, "t/rebuilt", batch.select("doc_id", "text"), post_corpus,
            jaccard_threshold=THRESH, catalog=cat2,
        )
    )
    assert got == want
    # the deleted doc 5 and rewritten doc 6 must not pair with their
    # former family batch dups (105 pairs with nothing at 5; 106 at 6)
    assert not any(5 in p[:2] or 6 in p[:2] for p in got)


def test_refresh_idempotent_on_redelivery(spark, corpus, tmp_path):
    cat = IndexCatalog(root=str(tmp_path))
    base = corpus.filter(F.col("doc_id") < 100)
    batch = corpus.filter(F.col("doc_id") >= 100)
    build_minhash_index(spark, base, "t/idem", catalog=cat)
    ins = batch.withColumn("_change_type", F.lit("insert"))
    refresh_minhash_index(spark, "t/idem", ins, version=1, catalog=cat)
    before = _pairs(
        dedup_against_index(
            spark, "t/idem", batch.select("doc_id", "text"), corpus,
            jaccard_threshold=THRESH, catalog=cat,
        )
    )
    # driver retry re-delivers the same commit — must be a no-op
    refresh_minhash_index(spark, "t/idem", ins, version=1, catalog=cat)
    after = _pairs(
        dedup_against_index(
            spark, "t/idem", batch.select("doc_id", "text"), corpus,
            jaccard_threshold=THRESH, catalog=cat,
        )
    )
    assert before == after


def test_stream_sync_entry_deterministic(spark):
    """The triggered-sync catalog entry equals the direct-refresh path
    and is stable across re-runs (fresh feed+checkpoint per call)."""
    from pdf_etl_ocr_inference_spark.plans import all_specs

    from .conftest import SF0001

    fn = all_specs()["dedup_index_stream_sync"].fn
    first = _pairs(fn(spark, SF0001))
    again = _pairs(fn(spark, SF0001))
    assert first == again
    direct = _pairs(
        all_specs()["dedup_minhash_incremental"].fn(spark, SF0001)
    )
    assert first == direct
