"""Capability-gated Delta interop tests: run for real when the public
delta-spark package is present, otherwise verify the clean-degradation
contract (clear error, no hard dependency)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.sources.delta_interop import (
    DeltaUnavailableError,
    delta_available,
    read_delta,
    read_delta_cdf,
    write_delta,
)

needs_delta = pytest.mark.skipif(
    not delta_available(), reason="delta-spark not installed"
)


@pytest.mark.skipif(delta_available(), reason="delta-spark IS installed")
def test_unavailable_raises_clear_error(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(DeltaUnavailableError, match="parquet-native"):
        write_delta(df, str(tmp_path / "t"))
    with pytest.raises(DeltaUnavailableError):
        read_delta(spark, str(tmp_path / "t"))
    with pytest.raises(DeltaUnavailableError):
        read_delta_cdf(spark, str(tmp_path / "t"))


@needs_delta
def test_delta_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    src = spark.range(10).withColumn("x", F.col("id") * 2)
    write_delta(src, path)
    got = read_delta(spark, path)
    assert got.count() == 10
    assert {r["x"] for r in got.collect()} == {i * 2 for i in range(10)}


@needs_delta
def test_delta_cdf_matches_native_contract(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(spark.range(5), path, cdf=True)
    write_delta(spark.range(5, 8), path, mode="append", cdf=True)
    changes = read_delta_cdf(spark, path, since_version=1)
    cols = set(changes.columns)
    assert "_change_type" in cols and "_commit_version" in cols
    assert changes.count() == 3
