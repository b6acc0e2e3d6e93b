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


def test_weighted_sample_nested_and_deterministic(spark):
    from pdf_etl_ocr_inference_spark.operators.sampling import (
        weighted_sample_topn,
    )

    docs = _docs(spark)
    top50 = [
        r["doc_id"]
        for r in weighted_sample_topn(docs, "doc_id", "n_chars", 50)
        .select("doc_id")
        .collect()
    ]
    top100 = [
        r["doc_id"]
        for r in weighted_sample_topn(docs, "doc_id", "n_chars", 100)
        .select("doc_id")
        .collect()
    ]
    assert len(top50) == 50 and len(top100) == 100
    assert set(top50) <= set(top100)  # nested: growing n only adds
    again = [
        r["doc_id"]
        for r in weighted_sample_topn(
            docs.repartition(7), "doc_id", "n_chars", 50
        )
        .select("doc_id")
        .collect()
    ]
    assert sorted(again) == sorted(top50)  # partition-layout invariant


def test_weighted_sample_pps_bias(spark):
    """A-ES inclusion probability is proportional to weight: with a
    planted 10x-weight minority, the sample must overrepresent it by
    a wide margin vs its population share."""
    from pdf_etl_ocr_inference_spark.operators.sampling import (
        weighted_sample_topn,
    )

    rows = [(i, 1000 if i % 10 == 0 else 100) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = weighted_sample_topn(df, "id", "w", 200).collect()
    heavy = sum(1 for r in got if r["id"] % 10 == 0)
    # population share of heavy ids is 10%; PPS share of total weight
    # is 1000*200/(1000*200+100*1800) = 52.6%
    assert heavy > 60, heavy


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from pdf_etl_ocr_inference_spark.operators.sampling import (
        weighted_sample_topn,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, 9)], ["id", "w"]
    )
    got = {r["id"] for r in weighted_sample_topn(df, "id", "w", 10).collect()}
    assert got == {1, 4}


def test_shuffle_shards_reproducible_balanced_complete(spark, sf_dir):
    """train_shuffle_shards: same seed → identical stream; shards
    balanced within a loose band; (shard, pos) is a bijection onto
    the corpus (no doc lost or duplicated by the permutation)."""
    from pdf_etl_ocr_inference_spark.plans import all_specs

    specs = all_specs()
    a = specs["train_shuffle_shards"].fn(spark, sf_dir).collect()
    b = specs["train_shuffle_shards"].fn(spark, sf_dir).collect()
    key = lambda r: (r["shard"], r["pos"], r["doc_id"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b)), "not reproducible"

    n = len(a)
    assert n == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len({(r["shard"], r["pos"]) for r in a}) == n, "pos collision"
    assert len({r["doc_id"] for r in a}) == n, "doc lost/duplicated"
    from collections import defaultdict

    from pdf_etl_ocr_inference_spark.plans.train_plans import (
        _SHUFFLE_SHARDS,
    )

    by_shard = defaultdict(list)
    for r in a:
        by_shard[r["shard"]].append(r["pos"])
    assert len(by_shard) == _SHUFFLE_SHARDS
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 2 * min(sizes), f"shards unbalanced: {sizes}"
    # per-shard positions are dense 1..len
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
