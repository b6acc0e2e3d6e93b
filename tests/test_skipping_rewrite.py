"""The skipping-scan optimizer rule: a plain ``scan.filter(box)``
over a table with a REGISTERED clustered layout is rewritten onto the
Z-ordered copy + footer-stats sidecar — results identical, fewer
files scheduled — and every guard rail leaves foreign plans
object-identical.

Staleness is the load-bearing property: the rule keys on the source
file inventory (sizes + mtimes), so a layout that lags its source
degrades to the brute scan instead of answering stale; an
append-only refresh re-syncs at cost ∝ new files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    """A multi-file copy of orders to act as the registered source
    (hermetic: staleness tests mutate it)."""
    d = str(tmp_path_factory.mktemp("skiprw") / "orders")
    (
        spark.read.parquet(f"{SF0001}/orders.parquet")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


SPECS = [
    {"col": "o_custkey", "kind": "int"},
    {"col": "o_orderdate", "kind": "days", "origin": "1995-01-01"},
]


def _box():
    return (
        F.col("o_custkey").between(100, 299)
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )


def _keys(df):
    return sorted(r["o_orderkey"] for r in df.select("o_orderkey").collect())


def _scan_file_count(df) -> int:
    """Number of files the (rewritten) plan's relation schedules."""
    node = df._jdf.queryExecution().analyzed()
    while node.nodeName() != "LogicalRelation":
        node = node.children().head()
    return node.relation().location().rootPaths().size()


@pytest.fixture(scope="module")
def registered(spark, src_dir):
    from pdf_etl_ocr_inference_spark.operators.layout import (
        register_clustered_layout,
    )

    return register_clustered_layout(spark, src_dir, SPECS, n_files=16)


def test_rewrite_fires_and_matches_brute(spark, src_dir, registered):
    from pdf_etl_ocr_inference_spark.optimizer import optimize

    df = spark.read.parquet(src_dir).filter(_box())
    opt = optimize(df)
    assert opt is not df
    assert _keys(opt) == _keys(df)
    assert set(opt.columns) == set(df.columns)


def test_rewrite_prunes_files(spark, src_dir, registered):
    from pdf_etl_ocr_inference_spark.optimizer import rewrite_skipping_scan

    df = spark.read.parquet(src_dir).filter(_box())
    opt = rewrite_skipping_scan(df)
    assert opt is not df
    # the rewritten relation schedules strictly fewer files than the
    # clustered copy holds — the skip actually engages
    assert _scan_file_count(opt) < 16


def test_projection_preserved(spark, src_dir, registered):
    from pdf_etl_ocr_inference_spark.optimizer import rewrite_skipping_scan

    df = (
        spark.read.parquet(src_dir)
        .select("o_orderkey", "o_custkey")
        .filter(F.col("o_custkey").between(100, 299))
    )
    opt = rewrite_skipping_scan(df)
    assert opt is not df
    assert opt.columns == ["o_orderkey", "o_custkey"]
    assert _keys(opt) == _keys(df)


def test_strict_and_equality_bounds(spark, src_dir, registered):
    from pdf_etl_ocr_inference_spark.optimizer import rewrite_skipping_scan

    df = spark.read.parquet(src_dir).filter(
        (F.col("o_custkey") > 100) & (F.col("o_custkey") < 299)
    )
    opt = rewrite_skipping_scan(df)
    assert opt is not df and _keys(opt) == _keys(df)
    df_eq = spark.read.parquet(src_dir).filter(F.col("o_custkey") == 150)
    opt_eq = rewrite_skipping_scan(df_eq)
    assert opt_eq is not df_eq and _keys(opt_eq) == _keys(df_eq)


def test_guard_rails_leave_plan_identical(spark, src_dir, registered):
    from pdf_etl_ocr_inference_spark.optimizer import rewrite_skipping_scan

    # computed projection
    df = (
        spark.read.parquet(src_dir)
        .withColumn("x", F.col("o_custkey") + 1)
        .filter(F.col("x") > 5)
    )
    assert rewrite_skipping_scan(df) is df
    # unregistered table
    df2 = spark.read.parquet(f"{SF0001}/lineitem.parquet").filter(
        F.col("l_quantity") > 10
    )
    assert rewrite_skipping_scan(df2) is df2
    # no bound on any clustered column
    df3 = spark.read.parquet(src_dir).filter(F.col("o_totalprice") > 1000)
    assert rewrite_skipping_scan(df3) is df3
    # no filter at all
    df4 = spark.read.parquet(src_dir)
    assert rewrite_skipping_scan(df4) is df4
    # join on top — not the scan shape
    df5 = df4.join(df4.select("o_orderkey"), "o_orderkey")
    assert rewrite_skipping_scan(df5) is df5


def test_residual_predicates_reapply(spark, src_dir, registered):
    """A conjunct the pruner can't use (string prefix) must still
    filter rows — the WHOLE original condition re-applies."""
    from pdf_etl_ocr_inference_spark.optimizer import rewrite_skipping_scan

    df = spark.read.parquet(src_dir).filter(
        F.col("o_custkey").between(100, 299)
        & F.col("o_orderpriority").startswith("1")
    )
    opt = rewrite_skipping_scan(df)
    assert opt is not df
    assert _keys(opt) == _keys(df)


def test_stale_layout_falls_through_then_refresh_resyncs(
    spark, src_dir, registered
):
    from pdf_etl_ocr_inference_spark.operators.layout import (
        refresh_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import rewrite_skipping_scan

    # noop refresh while in sync
    assert refresh_clustered_layout(spark, src_dir)["mode"] == "noop"

    # APPEND new rows as a new source file -> inventory drift -> no-op
    extra = (
        spark.read.parquet(f"{SF0001}/orders.parquet")
        .limit(50)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
    )
    extra.coalesce(1).write.mode("append").parquet(src_dir)
    df = spark.read.parquet(src_dir).filter(F.col("o_custkey") >= 0)
    assert rewrite_skipping_scan(df) is df  # never stale

    r = refresh_clustered_layout(spark, src_dir)
    assert r["mode"] == "incremental" and r["new_files"] >= 1

    df2 = spark.read.parquet(src_dir).filter(_box())
    opt2 = rewrite_skipping_scan(df2)
    assert opt2 is not df2
    assert _keys(opt2) == _keys(df2)  # appended rows visible

    # REWRITE a covered file -> refresh must full-rebuild
    import os

    os.utime(sorted(
        f"{src_dir}/{f}" for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )[0])
    assert refresh_clustered_layout(spark, src_dir)["mode"] == "rebuild"
    df3 = spark.read.parquet(src_dir).filter(_box())
    opt3 = rewrite_skipping_scan(df3)
    assert opt3 is not df3 and _keys(opt3) == _keys(df3)


def test_bloom_in_list_path(spark, src_dir):
    """An integer IN-list on a bloom_cols column routes through the
    Bloom point-lookup scan; string IN-lists and un-bloomed columns
    never do."""
    from pdf_etl_ocr_inference_spark.operators.layout import (
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import rewrite_skipping_scan

    register_clustered_layout(
        spark, src_dir, SPECS, n_files=16, bloom_cols=["o_orderkey"]
    )
    probe = [
        r["o_orderkey"]
        for r in spark.read.parquet(src_dir)
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(5)
        .collect()
    ]
    df = spark.read.parquet(src_dir).filter(
        F.col("o_orderkey").isin(probe)
    )
    opt = rewrite_skipping_scan(df)
    assert opt is not df
    assert _keys(opt) == _keys(df) == sorted(probe)
    assert _scan_file_count(opt) < 16  # the bloom actually prunes

    # combined IN + residual predicate still re-applies everything
    df2 = spark.read.parquet(src_dir).filter(
        F.col("o_orderkey").isin(probe) & (F.col("o_totalprice") > 0)
    )
    opt2 = rewrite_skipping_scan(df2)
    assert opt2 is not df2 and _keys(opt2) == _keys(df2)

    # string IN-list: no bloom for that column -> no-op
    df3 = spark.read.parquet(src_dir).filter(
        F.col("o_orderpriority").isin(["1-URGENT"])
    )
    assert rewrite_skipping_scan(df3) is df3


def test_layout_advisor_closes_the_loop(spark, src_dir):
    """suggest -> register -> the same workload's scans reroute."""
    from pdf_etl_ocr_inference_spark.operators.layout import (
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import (
        rewrite_skipping_scan,
        suggest_clustered_layout,
    )

    probe = [
        r["o_orderkey"]
        for r in spark.read.parquet(src_dir)
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(3)
        .collect()
    ]
    workload = [
        spark.read.parquet(src_dir).filter(_box()),
        spark.read.parquet(src_dir).filter(
            F.col("o_custkey").between(5, 10)
        ),
        spark.read.parquet(src_dir).filter(
            F.col("o_orderkey").isin(probe)
        ),
        # non-matching shapes cast no votes, never fail
        spark.read.parquet(src_dir),
        spark.read.parquet(src_dir).filter(
            F.col("o_orderpriority") == "1-URGENT"
        ),
    ]
    advice = suggest_clustered_layout(workload)
    assert list(advice) == [src_dir]
    got = advice[src_dir]
    assert [s["col"] for s in got["specs"]] == ["o_custkey", "o_orderdate"]
    assert got["bloom_cols"] == ["o_orderkey"]

    register_clustered_layout(
        spark, src_dir, got["specs"], bloom_cols=got["bloom_cols"]
    )
    for df in workload[:3]:
        opt = rewrite_skipping_scan(df)
        assert opt is not df
        assert _keys(opt) == _keys(df)


def test_served_sidecar_pinning(spark, src_dir):
    """Repeated rewritten queries serve the keep-list from the
    driver-pinned sidecar (no sidecar re-read), and a refresh
    invalidates the pin via the inventory fingerprint."""
    from pdf_etl_ocr_inference_spark.operators import layout as L
    from pdf_etl_ocr_inference_spark.operators.layout import (
        refresh_clustered_layout,
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import rewrite_skipping_scan

    register_clustered_layout(
        spark, src_dir, SPECS, n_files=16, bloom_cols=["o_orderkey"]
    )
    L._SIDECAR_CACHE.clear()
    L._BLOOM_CACHE.clear()

    df = spark.read.parquet(src_dir).filter(_box())
    first = rewrite_skipping_scan(df)
    assert first is not df and len(L._SIDECAR_CACHE) == 1
    fp0 = next(iter(L._SIDECAR_CACHE.values()))[0]

    # second query: cache object unchanged (same fingerprint), and
    # a poisoned loader proves the sidecar is NOT re-read
    orig = L.load_or_refresh_file_stats
    L.load_or_refresh_file_stats = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("sidecar re-read on warm path")
    )
    try:
        second = rewrite_skipping_scan(spark.read.parquet(src_dir).filter(_box()))
        assert second is not None
        assert _keys(second) == _keys(first)
    finally:
        L.load_or_refresh_file_stats = orig

    # bloom path pins too
    probe = [
        r["o_orderkey"]
        for r in spark.read.parquet(src_dir)
        .select("o_orderkey").orderBy("o_orderkey").limit(3).collect()
    ]
    dfb = spark.read.parquet(src_dir).filter(F.col("o_orderkey").isin(probe))
    ob = rewrite_skipping_scan(dfb)
    assert ob is not dfb and len(L._BLOOM_CACHE) == 1
    assert _keys(ob) == sorted(probe)

    # append + refresh -> new inventory -> pin invalidated, results fresh
    extra = (
        spark.read.parquet(f"{SF0001}/orders.parquet")
        .limit(20)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(20_000_000))
    )
    extra.coalesce(1).write.mode("append").parquet(src_dir)
    refresh_clustered_layout(spark, src_dir)
    df3 = spark.read.parquet(src_dir).filter(_box())
    o3 = rewrite_skipping_scan(df3)
    assert o3 is not df3
    assert _keys(o3) == _keys(df3)
    assert next(iter(L._SIDECAR_CACHE.values()))[0] != fp0
