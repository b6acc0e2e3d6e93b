"""The in-place-rewrite staleness contract, made executable (r9,
verdict #6): one module exercising every warm-probe surface so the
immutable-data-file convention can't silently erode.

Contract (documented once, at the manifest section header in
operators/layout.py): data files are immutable by convention — a
writer creates new files and RENAMES, which touches the parent
directory and flips every O(dirs) probe, so append/delete/replace is
always detected warm.  An in-place byte-level EDIT of an existing
file (open + write, no rename) does not touch the directory entry:

- the RESULT CACHE still detects it (its fingerprint reads per-FILE
  size + listing mtime from the plan's file index, and a byte edit
  bumps the file's own mtime);
- the MANIFEST fast paths (scan_point_lookup,
  load_or_refresh_file_stats verify="probe") and the REGISTERED
  LAYOUT warm probe (layout_fresh) do NOT — documented-unsupported,
  healed by the explicit refresh APIs (load_or_refresh_file_stats
  verify="full", build_file_bloom, refresh_clustered_layout), which
  these tests assert.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _data_files(d: str) -> list[str]:
    return sorted(
        f"{d}/{f}"
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _byte_edit_in_place(target: str, donor_dir: str) -> None:
    """Overwrite ``target``'s CONTENTS with the donor dir's single
    parquet file via open+write — the file's own mtime changes, the
    parent directory's mtime does not (the class every dir-mtime
    probe is documented not to catch).  The Hadoop ``.crc`` sidecar
    is byte-edited the same way so reads stay checksum-consistent
    WITHOUT a directory-touching delete."""
    donor = _data_files(donor_dir)[0]
    with open(donor, "rb") as src, open(target, "wb") as dst:
        dst.write(src.read())
    tdir, tname = os.path.dirname(target), os.path.basename(target)
    ddir, dname = os.path.dirname(donor), os.path.basename(donor)
    tcrc = f"{tdir}/.{tname}.crc"
    dcrc = f"{ddir}/.{dname}.crc"
    if os.path.exists(tcrc) and os.path.exists(dcrc):
        with open(dcrc, "rb") as src, open(tcrc, "wb") as dst:
            dst.write(src.read())


def _write(spark, rows, schema, d: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)


# ------------------------------------------------------------------
# Surface 1: the manifest fast paths (point lookup + stats refresh)
# ------------------------------------------------------------------


def test_point_lookup_rename_rewrite_detected_warm(spark, tmp_path):
    """A same-name REPLACE (os.replace = the rename class) flips the
    directory probe, so the warm manifest path falls through to the
    live listing and the stale Bloom row reads as uncovered —
    conservative keep, rows never lost."""
    import time

    from pdf_etl_ocr_inference_spark.operators.layout import (
        build_file_bloom,
        scan_point_lookup,
    )

    d = str(tmp_path / "tbl")
    _write(spark, [(i,) for i in range(100)], "id long", d)
    build_file_bloom(spark, d, "id")

    # warm lookup through the manifest fast path first
    df, n_read, n_total = scan_point_lookup(spark, d, "id", [3])
    assert n_total == 1 and df.count() == 1

    # replace the data file: same name, ids now 1000..1099
    d2 = str(tmp_path / "tbl2")
    _write(spark, [(1000 + i,) for i in range(100)], "id long", d2)
    time.sleep(0.01)
    os.replace(_data_files(d2)[0], _data_files(d)[0])
    for f in os.listdir(d):  # Hadoop .crc sidecars are now stale
        if f.endswith(".crc"):
            os.remove(f"{d}/{f}")

    # the Bloom sidecar knows nothing about 1005 — a stale-served
    # manifest would prune the file and lose the row
    df, n_read, n_total = scan_point_lookup(spark, d, "id", [1005])
    assert n_read == 1
    assert [r["id"] for r in df.collect()] == [1005]


def test_point_lookup_byte_edit_unsupported_then_healed(spark, tmp_path):
    """The documented-unsupported class: an in-place byte edit
    preserves the directory probe, so the warm fast path still
    serves the OLD Bloom verdicts (here: a miss for the new ids).
    The explicit rebuild heals it.  This test pins BOTH halves so
    neither the convention nor the healing path can silently
    change."""
    from pdf_etl_ocr_inference_spark.operators.layout import (
        build_file_bloom,
        fresh_manifest_doc,
        scan_point_lookup,
    )

    d = str(tmp_path / "tbl")
    _write(spark, [(i,) for i in range(100)], "id long", d)
    build_file_bloom(spark, d, "id")
    scan_point_lookup(spark, d, "id", [3])  # prime the fast path

    donor = str(tmp_path / "donor")
    _write(spark, [(1000 + i,) for i in range(100)], "id long", donor)
    probe_before = fresh_manifest_doc(d)
    _byte_edit_in_place(_data_files(d)[0], donor)

    # the probe did NOT flip: the manifest still verifies ...
    assert fresh_manifest_doc(d) is not None
    assert fresh_manifest_doc(d)["digest"] == probe_before["digest"]
    # ... so the warm lookup misses the edited-in ids (unsupported
    # class, served from the stale Bloom)
    df, n_read, _ = scan_point_lookup(spark, d, "id", [1005])
    assert n_read == 0 and df.count() == 0

    # the explicit refresh API heals: rebuild re-reads every file
    build_file_bloom(spark, d, "id")
    df, n_read, _ = scan_point_lookup(spark, d, "id", [1005])
    assert n_read == 1
    assert [r["id"] for r in df.collect()] == [1005]


def test_stats_refresh_probe_vs_full_verify(spark, tmp_path):
    """verify="probe" (warm default) returns the sidecar without
    per-file work when the probe holds — including after a byte edit
    (unsupported class); verify="full" pays the fingerprint sweep
    and re-foots the edited file."""
    from pdf_etl_ocr_inference_spark.operators.layout import (
        load_or_refresh_file_stats,
    )

    d = str(tmp_path / "tbl")
    _write(spark, [(i,) for i in range(100)], "k long", d)
    load_or_refresh_file_stats(spark, d, ["k"])  # build + stamp

    donor = str(tmp_path / "donor")
    _write(spark, [(1000 + i,) for i in range(100)], "k long", donor)
    _byte_edit_in_place(_data_files(d)[0], donor)

    # probe path: stale min/max served (documented), and NO live
    # sweep ran — assert by poisoning the live listing
    import pdf_etl_ocr_inference_spark.operators.layout as L

    orig = L._live_stat_map
    L._live_stat_map = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("warm probe path must not sweep files")
    )
    try:
        warm = load_or_refresh_file_stats(spark, d, ["k"])
        row = [r for r in warm.collect() if r["col"] == "k"][0]
        assert row["vmax"] <= 99.0  # stale, as documented
    finally:
        L._live_stat_map = orig

    # full verify: the edited file's fingerprint mismatches and is
    # re-footed
    healed = load_or_refresh_file_stats(spark, d, ["k"], verify="full")
    row = [r for r in healed.collect() if r["col"] == "k"][0]
    assert row["vmin"] >= 1000.0

    # and the heal re-stamped the manifest: the probe path now
    # serves the HEALED stats
    warm2 = load_or_refresh_file_stats(spark, d, ["k"])
    row2 = [r for r in warm2.collect() if r["col"] == "k"][0]
    assert row2["vmin"] >= 1000.0


# ------------------------------------------------------------------
# Surface 2: the result cache
# ------------------------------------------------------------------


def test_result_cache_detects_byte_edit(spark, tmp_path):
    """The result cache fingerprints per-FILE (size, listing mtime)
    from the plan's file index, so even the byte-edit class the
    dir-mtime probes cannot see produces a NEW fingerprint — a miss,
    never a stale answer."""
    from pdf_etl_ocr_inference_spark.operators.result_cache import (
        plan_fingerprint,
    )

    d = str(tmp_path / "tbl")
    _write(spark, [(i,) for i in range(100)], "k long", d)
    fp1 = plan_fingerprint(spark.read.parquet(d).groupBy().count())

    donor = str(tmp_path / "donor")
    _write(spark, [(1000 + i,) for i in range(100)], "k long", donor)
    import time

    time.sleep(0.01)  # coarse-mtime filesystems
    _byte_edit_in_place(_data_files(d)[0], donor)

    # "AS OF THE PLAN'S LISTING" (plan_fingerprint docstring): Spark's
    # session FileStatusCache serves the OLD (size, mtime) until the
    # listing refreshes, so the same-session window extends to a
    # byte edit behind a cached listing — refreshByPath models the
    # fresh listing every new session/driver sees
    spark.catalog.refreshByPath(d)
    fp2 = plan_fingerprint(spark.read.parquet(d).groupBy().count())
    assert fp1 != fp2, "byte edit must change the cache fingerprint"


# ------------------------------------------------------------------
# Surface 3: the registered-layout warm probe
# ------------------------------------------------------------------


def test_layout_probe_byte_edit_unsupported_then_refresh_heals(
    spark, tmp_path
):
    """layout_fresh's warm probe (file count + dir mtime) does not
    see a byte edit of a SOURCE file (documented at _source_probe);
    refresh_clustered_layout pays the full per-file sweep, sees the
    fingerprint change, and REBUILDS."""
    from pdf_etl_ocr_inference_spark.operators.layout import (
        layout_fresh,
        layout_key,
        refresh_clustered_layout,
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import IndexCatalog

    src = str(tmp_path / "src")
    _write(spark, [(i, i) for i in range(200)], "k long, v long", src)
    cat = IndexCatalog()
    meta = register_clustered_layout(
        spark, src, [{"col": "k", "kind": "int"}], n_files=2,
        catalog=cat,
    )
    assert layout_fresh(src, meta)

    donor = str(tmp_path / "donor")
    _write(
        spark, [(1000 + i, i) for i in range(200)], "k long, v long",
        donor,
    )
    _byte_edit_in_place(_data_files(src)[0], donor)

    # warm probe: same file count, same dir mtime → still "fresh"
    # (the documented-unsupported class, NOT a detection promise)
    assert layout_fresh(src, meta)

    # the explicit sync API sweeps per-file fingerprints and rebuilds
    out = refresh_clustered_layout(spark, src, catalog=cat)
    assert out["mode"] == "rebuild"
    new_meta = cat.lookup(layout_key(src))
    assert layout_fresh(src, new_meta)
    # and the rebuilt layout serves the EDITED rows
    got = spark.read.parquet(new_meta["layout_path"])
    assert got.filter(F.col("k") >= 1000).count() == 200


def test_layout_rename_rewrite_detected_warm(spark, tmp_path):
    """The rename class on a registered layout's SOURCE: os.replace
    bumps the source dir mtime, the probe flips, and layout_fresh
    goes False (the optimizer rule then falls through to the brute
    scan — never a stale answer)."""
    import time

    from pdf_etl_ocr_inference_spark.operators.layout import (
        layout_fresh,
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import IndexCatalog

    src = str(tmp_path / "src")
    _write(spark, [(i, i) for i in range(200)], "k long, v long", src)
    cat = IndexCatalog()
    meta = register_clustered_layout(
        spark, src, [{"col": "k", "kind": "int"}], n_files=2,
        catalog=cat,
    )
    assert layout_fresh(src, meta)

    d2 = str(tmp_path / "repl")
    _write(spark, [(9, 9)], "k long, v long", d2)
    time.sleep(0.01)
    os.replace(_data_files(d2)[0], _data_files(src)[0])
    assert not layout_fresh(src, meta)
