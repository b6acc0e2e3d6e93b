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


def test_countmin_overestimates_only(spark):
    """CMS guarantee: min-over-rows estimate never under-counts, and
    with w=512 cells per row the slack on this corpus stays small."""
    from pdf_etl_ocr_inference_spark.plans.sketch_plans import (
        sketch_countmin,
    )

    rows = sketch_countmin(spark, SF).collect()
    assert len(rows) == 10
    n_total = _events(spark).count()
    for r in rows:
        assert r["cms_est"] >= r["exact_n"], r
        # standard CMS bound: overshoot <= e/w * N per row (d=4 rows
        # make exceeding it astronomically unlikely); 3x for slack
        assert r["cms_est"] - r["exact_n"] <= 3 * math.e / 512 * n_total, r


def test_countmin_merge_is_cellwise_add(spark):
    """Sketching two halves separately and adding cells equals
    sketching the whole — the property that makes CMS shard-mergeable
    at 100 TB (union + re-agg, no raw re-scan)."""
    from pdf_etl_ocr_inference_spark.plans.sketch_plans import (
        _CMS_H,
        _CMS_P,
        _CMS_W,
    )

    ev = _events(spark)
    hc = spark.createDataFrame(list(_CMS_H), "j int, a long, b long")
    cell = ((F.col("user_id") * F.col("a") + F.col("b")) % _CMS_P) % _CMS_W

    def cms(df):
        return (
            df.crossJoin(F.broadcast(hc))
            .select("j", cell.alias("cx"))
            .groupBy("j", "cx")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    whole = {(r["j"], r["cx"]): r["c"] for r in cms(ev).collect()}
    h1 = cms(ev.filter("event_id % 2 = 0"))
    h2 = cms(ev.filter("event_id % 2 = 1"))
    merged_df = (
        h1.unionByName(h2)
        .groupBy("j", "cx")
        .agg(F.sum("c").alias("c"))
    )
    merged = {(r["j"], r["cx"]): r["c"] for r in merged_df.collect()}
    assert merged == whole


def test_hll_union_accuracy_and_order_independence(spark):
    """The day-sketch → union rollup stays within HLL's error band of
    the exact distinct, and repartitioning the input (different
    update order) changes nothing — register merge is a max."""
    from pdf_etl_ocr_inference_spark.plans.sketch_plans import (
        sketch_hll_union,
    )

    rows = sketch_hll_union(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["rel_err"] <= 0.05, r

    ev = _events(spark).repartition(13)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    re = {
        r["event_type"]: r["u"]
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u"))
        .collect()
    }
    assert re == {r["event_type"]: r["approx_users"] for r in rows}
