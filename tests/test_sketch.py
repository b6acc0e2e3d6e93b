"""KMV distinct sketch and two-phase heavy hitters: parity with the
naive computation, mergeability, bounded candidate sets."""

import math

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.sketch import (
    heavy_hitters,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_kmv_estimate_accuracy(spark):
    """Relative error of (k-1)/u_k is ~1/sqrt(k); assert a loose 3x
    band at k=128 on the props column (high cardinality)."""
    ev = _events(spark)
    k = 128
    est = kmv_estimate(kmv_sketch(ev, "event_id", k), k).first()[
        "est_distinct"
    ]
    exact = ev.select(F.countDistinct("event_id")).first()[0]
    assert exact > k  # the estimate path, not the exact fallback
    rel = abs(est - exact) / exact
    assert rel < 3.0 / math.sqrt(k), (est, exact, rel)


def test_kmv_exact_below_k(spark):
    """Under k distinct values the sketch degrades to an exact count."""
    ev = _events(spark)
    k = 4096
    est = kmv_estimate(kmv_sketch(ev, "user_id", k), k).first()
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    assert exact < k
    assert est["n_hashes"] == exact
    assert est["est_distinct"] == float(exact)


def test_kmv_merge_equals_whole(spark):
    """Union-of-sketches re-limited to k IS the sketch of the union —
    the property that lets per-partition/per-day sketches roll up."""
    ev = _events(spark)
    k = 64
    a = kmv_sketch(ev.filter(F.col("event_id") % 2 == 0), "props", k)
    b = kmv_sketch(ev.filter(F.col("event_id") % 2 == 1), "props", k)
    merged = sorted(
        r["h"] for r in kmv_merge(a, b).orderBy("h").limit(k).collect()
    )
    whole = sorted(r["h"] for r in kmv_sketch(ev, "props", k).collect())
    assert merged == whole


def test_heavy_hitters_matches_naive(spark):
    ev = _events(spark)
    eps = 0.008
    got = sorted(
        (r["user_id"], r["n_rows"])
        for r in heavy_hitters(ev, "user_id", eps).collect()
    )
    n = ev.count()
    thresh = math.ceil(eps * n)
    naive = sorted(
        (r["user_id"], r["cnt"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thresh)
        .collect()
    )
    assert got == naive and len(got) > 0


def test_heavy_hitters_planted_skew(spark):
    """A planted hot key among a wide uniform key space must be the
    only hitter, and the candidate pass must stay bounded (superset
    property: the hot key survives every partitioning)."""
    rows = [(i, 777 if i % 4 == 0 else i) for i in range(8000)]
    # 2000 planted rows plus the natural (777, 777) row -> 2001
    df = spark.createDataFrame(rows, ["i", "k"]).repartition(16)
    got = heavy_hitters(df, "k", 0.1).collect()
    assert [(r["k"], r["n_rows"]) for r in got] == [(777, 2001)]
