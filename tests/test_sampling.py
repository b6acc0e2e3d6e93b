"""Stratified sampling: nestedness under rate increases, exact
per-stratum sizes, determinism, and rate accuracy."""

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.sampling import (
    stratified_fixed_n,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_nested_under_rate_increase(spark):
    docs = _docs(spark)
    small = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", "doc_id", {"en": 0.2}, default_rate=0.1
        ).collect()
    }
    big = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", "doc_id", {"en": 0.6}, default_rate=0.3
        ).collect()
    }
    assert small <= big  # raising rates only ADDS rows


def test_rates_approximately_achieved(spark):
    docs = _docs(spark)
    kept = stratified_sample(
        docs, "lang", "doc_id", {"en": 0.5}, default_rate=0.2
    )
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    en_frac = got.get("en", 0) / totals["en"]
    assert 0.3 < en_frac < 0.7  # small-sample tolerance around 0.5
    rest_tot = sum(v for k, v in totals.items() if k != "en")
    rest_got = sum(v for k, v in got.items() if k != "en")
    assert 0.05 < rest_got / rest_tot < 0.4  # around 0.2


def test_fixed_n_exact_sizes_and_determinism(spark):
    docs = _docs(spark)
    out = stratified_fixed_n(docs, "lang", "doc_id", 7)
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(7, totals[lang])
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_fixed_n(
            docs.repartition(13), "lang", "doc_id", 7
        ).collect()
    )
    assert a == b  # partition-layout invariant
