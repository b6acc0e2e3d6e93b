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
    """The day-sketch → union rollup stays within the portable HLL's
    error band of the exact distinct, and repartitioning the input
    (different update order) changes nothing — register merge is a
    max."""
    from pdf_etl_ocr_inference_spark.operators.sketch import (
        hll_estimate,
        hll_register_index,
        hll_rho,
        md5_u48,
    )
    from pdf_etl_ocr_inference_spark.plans.sketch_plans import (
        sketch_hll_union,
    )

    rows = sketch_hll_union(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["rel_err_ppm"] <= 50_000, r  # 5%

    # order independence: re-derive the union registers from a
    # reshuffled input; same registers -> same shared estimate
    h = md5_u48(F.col("user_id"))
    merged = (
        _events(spark)
        .repartition(13)
        .select(
            "event_type",
            hll_register_index(h).alias("j"),
            hll_rho(h).alias("rho"),
        )
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("rho"))
        .collect()
    )
    regs: dict = {}
    for r in merged:
        regs.setdefault(r["event_type"], {})[int(r["j"])] = int(r["rho"])
    re = {t: hll_estimate(d) for t, d in regs.items()}
    assert re == {r["event_type"]: r["approx_users"] for r in rows}


def test_hll_datasketches_builtins_stay_exercised(spark):
    """The Spark 4 datasketches built-ins (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate) remain the engine-specific
    alternative to the portable kernel: same day-sketch → union
    shape, estimate within the same 5% band of exact, and
    order-independent under repartition."""
    ev = _events(spark)
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }

    def builtin(df):
        daily = df.groupBy(
            "event_type", F.to_date("ts").alias("d")
        ).agg(F.hll_sketch_agg("user_id").alias("sk"))
        return {
            r["event_type"]: r["u"]
            for r in daily.groupBy("event_type")
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u")
            )
            .collect()
        }

    est = builtin(ev)
    for t, n in exact.items():
        assert abs(est[t] - n) / n <= 0.05, (t, est[t], n)
    assert builtin(ev.repartition(13)) == est


def test_hll_estimate_raw_branch():
    """No fixture SF reaches the raw harmonic branch (all
    cardinalities sit in linear counting at m=1024): exercise it in
    pure Python — 20k synthetic distincts must leave too few zero
    registers for LC and still estimate within ~3 std errors."""
    import hashlib

    from pdf_etl_ocr_inference_spark.operators.sketch import (
        HLL_M,
        HLL_P,
        hll_estimate,
    )

    wb = 48 - HLL_P
    regs: dict = {}
    n = 20_000
    for i in range(n):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        j = h & (HLL_M - 1)
        w = h >> HLL_P
        rho = (wb + 1) - w.bit_length() if w > 0 else wb + 1
        regs[j] = max(regs.get(j, 0), rho)
    est = hll_estimate(regs)
    # branch check: raw estimate must exceed the 2.5m LC cutoff
    assert est > 2.5 * HLL_M
    assert abs(est - n) / n <= 0.10, est
