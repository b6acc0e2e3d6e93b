"""BM25 postings-index rewrite rule: fires on the hinted top-k shape,
produces the scan path's exact results, and leaves non-matching plans
object-identical (guard rails)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.search import (
    bm25_topk,
    build_postings_index,
)
from pdf_etl_ocr_inference_spark.optimizer import (
    IndexCatalog,
    rewrite_bm25_topk,
)

from .conftest import SF0001

TERMS = ["spark", "vector", "join"]


def _setup(spark, tmp_path, key):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    path = str(tmp_path / "postings")
    build_postings_index(spark, docs, path)
    cat = IndexCatalog(root=str(tmp_path / "cat"))
    cat.register(key, {"kind": "postings", "path": path})
    return docs, cat


def test_rewrite_fires_and_matches_scan(spark, tmp_path):
    key = "postings/test"
    docs, cat = _setup(spark, tmp_path, key)
    plan = bm25_topk(docs, "text", "doc_id", TERMS, k=10, table_key=key)
    rewritten = rewrite_bm25_topk(plan, catalog=cat)
    assert rewritten is not plan  # the rule fired
    # the probe plan must NOT scan the documents parquet
    phys = rewritten._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in phys
    assert [tuple(r) for r in rewritten.collect()] == [
        tuple(r) for r in plan.collect()
    ]


def test_guard_no_index_object_identical(spark, tmp_path):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    cat = IndexCatalog(root=str(tmp_path / "empty"))
    plan = bm25_topk(
        docs, "text", "doc_id", TERMS, k=10, table_key="postings/absent"
    )
    assert rewrite_bm25_topk(plan, catalog=cat) is plan


def test_guard_unhinted_object_identical(spark, tmp_path):
    key = "postings/test2"
    docs, cat = _setup(spark, tmp_path, key)
    plan = bm25_topk(docs, "text", "doc_id", TERMS, k=10)  # no hint
    assert rewrite_bm25_topk(plan, catalog=cat) is plan


def test_guard_wrong_shape_object_identical(spark, tmp_path):
    key = "postings/test3"
    docs, cat = _setup(spark, tmp_path, key)
    hinted = bm25_topk(
        docs, "text", "doc_id", TERMS, k=10, table_key=key
    )
    # a filter on top breaks the GlobalLimit>...>Sort root shape
    wrapped = hinted.filter(F.col("id") >= 0)
    assert rewrite_bm25_topk(wrapped, catalog=cat) is wrapped


def test_optimize_entry_point_applies_bm25_rule(spark, tmp_path):
    from pdf_etl_ocr_inference_spark.optimizer import optimize

    key = "postings/test4"
    docs, cat = _setup(spark, tmp_path, key)
    plan = bm25_topk(docs, "text", "doc_id", TERMS, k=10, table_key=key)
    rewritten = optimize(plan, catalog=cat)
    assert rewritten is not plan
    phys = rewritten._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in phys
