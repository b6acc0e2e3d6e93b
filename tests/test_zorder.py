"""Z-order layout: bit-math correctness + measured multi-dimension
row-group pruning vs a linear sort.

The claim that matters at 100 TB: after Z-order clustering, parquet
min/max stats are selective for EVERY interleaved dimension, while a
linear sort serves only its leading column. Measured here directly on
file-level stats with pyarrow.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF0001


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    n = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * n + i)
    return z


def test_zorder_key_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.layout import zorder_key

    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (4095, 4095), (100, 2400)]
    df = spark.createDataFrame(cases, "x long, y long").select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=12).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _py_morton([r["x"], r["y"]], 12), (r["x"], r["y"])


def _stats_ranges(path_glob: str, cols: list[str]):
    """Per-file (min, max) for each column, from parquet row-group stats."""
    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for i, name in enumerate(schema_names):
                if name not in cols:
                    continue
                st = md.row_group(rg).column(i).statistics
                lo, hi = st.min, st.max
                mins[name] = lo if mins[name] is None else min(mins[name], lo)
                maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _overlap_frac(ranges, col, lo, hi) -> float:
    n = len(ranges)
    hit = sum(1 for r in ranges if not (r[col][1] < lo or r[col][0] > hi))
    return hit / n


def _box(lo: float, hi: float, frac_lo: float, frac_hi: float):
    """Sub-range of [lo, hi] between the given domain fractions —
    query boxes derive from the observed domain, so the test holds
    whatever key ranges the testdata generator used this round."""
    span = hi - lo
    return lo + frac_lo * span, lo + frac_hi * span


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.layout import zorder_key
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    base = tmp_path_factory.mktemp("layouts")
    orders = load_table(spark, SF0001, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))
        ).alias("o_days"),
    )
    dom = orders.agg(
        F.min("o_custkey").alias("c_lo"),
        F.max("o_custkey").alias("c_hi"),
        F.min("o_days").alias("d_lo"),
        F.max("o_days").alias("d_hi"),
    ).first()

    def scaled(col: str, lo: int, hi: int):
        # min-max rescale into [0, 4095] — the zorder_key docstring's
        # caller contract (clamping with & would alias wrapped keys)
        return (
            (F.col(col) - F.lit(lo))
            * F.lit(4095)
            / F.lit(max(hi - lo, 1))
        ).cast("long")

    zp = str(base / "zorder")
    lp = str(base / "linear")
    z = zorder_key(
        [
            scaled("o_custkey", dom.c_lo, dom.c_hi),
            scaled("o_days", dom.d_lo, dom.d_hi),
        ],
        bits=12,
    )
    (
        orders.withColumn("_z", z)
        .repartitionByRange(16, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(zp)
    )
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lp)
    )
    cols = ["o_custkey", "o_days"]
    return (
        _stats_ranges(zp + "/*.parquet", cols),
        _stats_ranges(lp + "/*.parquet", cols),
        dom,
    )


def test_zorder_prunes_both_dimensions(layouts):
    zr, lr, dom = layouts
    assert len(zr) == 16 and len(lr) == 16
    # narrow box in each dimension separately (~1/16 of the domain)
    cust = _overlap_frac(zr, "o_custkey", *_box(dom.c_lo, dom.c_hi, 0.30, 0.36))
    days = _overlap_frac(zr, "o_days", *_box(dom.d_lo, dom.d_hi, 0.30, 0.36))
    # z-order must prune meaningfully on BOTH dims at once
    assert cust <= 0.5, f"zorder custkey overlap {cust}"
    assert days <= 0.5, f"zorder days overlap {days}"


def test_file_skipping_scan_prunes_and_preserves_results(spark, tmp_path):
    """op70b's mechanism end-to-end: the footer-stats sidecar matches
    pyarrow ground truth, the pruned scan reads STRICTLY fewer files
    than the directory holds, and the filtered result is identical to
    the unpruned scan (correctness never rests on the stats)."""
    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.layout import (
        collect_file_stats,
        scan_with_skipping,
    )
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    path = str(tmp_path / "orders_by_cust")
    orders = load_table(spark, SF0001, "orders")
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    stats = collect_file_stats(spark, path, ["o_custkey"]).collect()
    truth = _stats_ranges(path + "/*.parquet", ["o_custkey"])
    got = sorted((r["vmin"], r["vmax"]) for r in stats)
    want = sorted((float(t["o_custkey"][0]), float(t["o_custkey"][1])) for t in truth)
    assert got == want

    lo, hi = 100, 140
    pruned, n_read, n_total = scan_with_skipping(
        spark, path, {"o_custkey": (lo, hi)}
    )
    assert n_total == 16
    assert 0 < n_read < n_total, f"no pruning: {n_read}/{n_total}"
    pred = F.col("o_custkey").between(lo, hi)
    got_keys = sorted(
        r["o_orderkey"] for r in pruned.filter(pred).select("o_orderkey").collect()
    )
    want_keys = sorted(
        r["o_orderkey"] for r in orders.filter(pred).select("o_orderkey").collect()
    )
    assert got_keys == want_keys and len(want_keys) > 0


def test_file_skipping_empty_keeplist(spark, tmp_path):
    """A box disjoint from every file yields an empty (but
    schema-stable) result, not an error."""
    from pdf_etl_ocr_inference_spark.operators.layout import scan_with_skipping
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    path = str(tmp_path / "orders_flat")
    load_table(spark, SF0001, "orders").repartition(2).write.mode(
        "overwrite"
    ).parquet(path)
    df, n_read, n_total = scan_with_skipping(
        spark, path, {"o_custkey": (-500, -100)}
    )
    assert n_read == 0 and n_total == 2
    assert df.count() == 0
    assert "o_orderkey" in df.columns


def test_bloom_point_lookup_prunes_where_minmax_cannot(spark, tmp_path):
    """op70c's mechanism: table laid out by o_custkey, probe by
    o_orderkey.  Every file's orderkey RANGE covers the probe (min/max
    skipping keeps 16/16), the Bloom sidecar keeps only a few files,
    and the looked-up rows are exactly the IN-predicate rows."""
    from pdf_etl_ocr_inference_spark.operators.layout import (
        build_file_bloom,
        scan_point_lookup,
        scan_with_skipping,
    )
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    path = str(tmp_path / "orders_by_cust_bloom")
    orders = load_table(spark, SF0001, "orders")
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    build_file_bloom(spark, path, "o_orderkey")
    keys = sorted(r["o_orderkey"] for r in orders.select("o_orderkey").collect())
    probe = [keys[0], keys[len(keys) // 2], keys[-1]]

    # min/max skipping on the un-clustered column keeps everything
    _, mm_read, mm_total = scan_with_skipping(
        spark, path, {"o_orderkey": (min(probe), max(probe))}
    )
    assert mm_read == mm_total == 16

    hit, n_read, n_total = scan_point_lookup(spark, path, "o_orderkey", probe)
    assert n_total == 16
    assert n_read < 16, f"bloom did not prune: {n_read}/{n_total}"
    got = sorted(r["o_orderkey"] for r in hit.select("o_orderkey").collect())
    assert got == sorted(probe)


def test_bloom_no_hit_reads_nothing(spark, tmp_path):
    from pdf_etl_ocr_inference_spark.operators.layout import (
        build_file_bloom,
        scan_point_lookup,
    )
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    path = str(tmp_path / "orders_bloom_miss")
    load_table(spark, SF0001, "orders").repartition(4).write.mode(
        "overwrite"
    ).parquet(path)
    build_file_bloom(spark, path, "o_orderkey")
    df, n_read, n_total = scan_point_lookup(
        spark, path, "o_orderkey", [-7, -9]
    )
    assert n_total == 4
    # fpp ~1% per (file, value): 8 membership tests → overwhelmingly 0
    assert n_read <= 1
    assert df.count() == 0


def test_stale_sidecar_never_loses_rows(spark, tmp_path):
    """Files added AFTER a sidecar build must still be read: a cached
    stats DataFrame and an on-disk bloom sidecar both predate an
    append; the reconciliation keeps uncovered files conservatively,
    so results stay complete (extra reads, never missing rows)."""
    import shutil

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.layout import (
        build_file_bloom,
        collect_file_stats,
        scan_point_lookup,
        scan_with_skipping,
    )

    path = str(tmp_path / "growing")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(2).write.mode("overwrite").parquet(path)
    stats = collect_file_stats(spark, path, ["id"])
    stats = spark.createDataFrame(stats.collect(), stats.schema)  # frozen
    build_file_bloom(spark, path, "id")

    # append a new file the sidecars know nothing about
    extra = str(tmp_path / "extra")
    spark.range(1000, 1010).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(extra)
    import glob

    part = glob.glob(f"{extra}/part-*.parquet")[0]
    shutil.move(part, f"{path}/appended.parquet")

    df, n_read, n_total = scan_with_skipping(
        spark, path, {"id": (1000, 1009)}, stats=stats
    )
    assert n_total == 3
    got = sorted(
        r["id"] for r in df.filter(F.col("id").between(1000, 1009)).collect()
    )
    assert got == list(range(1000, 1010)), "appended rows lost"

    hit, n_read2, n_total2 = scan_point_lookup(
        spark, path, "id", [1005, 7]
    )
    assert n_total2 == 3
    got2 = sorted(r["id"] for r in hit.collect())
    assert got2 == [7, 1005], "bloom-uncovered file skipped"


def test_incremental_stats_sidecar_equals_rebuild(spark, tmp_path):
    """load_or_refresh_file_stats: the persisted sidecar folds ONLY
    new files' footers in, drops vanished files' rows, and always
    equals a from-scratch rebuild."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.layout import (
        collect_file_stats,
        load_or_refresh_file_stats,
        scan_with_skipping,
    )

    path = str(tmp_path / "t")
    spark.range(0, 100).select("id").repartition(2).write.mode(
        "overwrite"
    ).parquet(path)

    def norm(df):
        return sorted(map(tuple, df.collect()))

    s1 = load_or_refresh_file_stats(spark, path, ["id"])
    assert norm(s1) == norm(collect_file_stats(spark, path, ["id"]))
    assert os.path.isdir(f"{path}/_stats")

    # append a file: refresh must fold it in and equal a full rebuild
    extra = str(tmp_path / "x")
    spark.range(500, 520).select("id").coalesce(1).write.parquet(extra)
    shutil.move(
        glob.glob(f"{extra}/part-*.parquet")[0], f"{path}/new.parquet"
    )
    s2 = load_or_refresh_file_stats(spark, path, ["id"])
    assert norm(s2) == norm(collect_file_stats(spark, path, ["id"]))
    assert len(norm(s2)) == 3

    # vanish a file: rows for it drop on the next refresh
    os.remove(f"{path}/new.parquet")
    s3 = load_or_refresh_file_stats(spark, path, ["id"])
    assert len(norm(s3)) == 2
    assert norm(s3) == norm(collect_file_stats(spark, path, ["id"]))

    # changed column set forces a clean rebuild (id+v table)
    spark.range(0, 10).select(
        "id", (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "y"))

    # and the maintained sidecar serves the pruned scan unchanged
    pruned, n_read, n_total = scan_with_skipping(
        spark, path, {"id": (0, 10)}, stats=s3
    )
    assert n_total == 2 and n_read >= 1
    assert pruned.filter(F.col("id") <= 10).count() == 11


def test_linear_sort_serves_only_leading_column(layouts):
    _, lr, dom = layouts
    cust = _overlap_frac(lr, "o_custkey", *_box(dom.c_lo, dom.c_hi, 0.30, 0.36))
    days = _overlap_frac(lr, "o_days", *_box(dom.d_lo, dom.d_hi, 0.30, 0.36))
    assert cust <= 0.25, f"linear leading-col overlap {cust}"
    # non-leading column: every file spans ~the full date range
    assert days >= 0.9, f"linear non-leading overlap {days}"
