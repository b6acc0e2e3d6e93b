"""Side-effecting catalog entries must be re-runnable: the driver (and
bench) may invoke any query multiple times in one or across sessions.
Each op here writes somewhere (scratch dirs, warehouse tables, CDF
commits) — run twice, results must be identical.
"""

from __future__ import annotations

import pytest

from pdf_etl_ocr_inference_spark.plans import all_specs

from .conftest import SF0001

_SIDE_EFFECTING = [
    "op01_csv_roundtrip",
    "op03_partitioned_write",
    "op06_fetch_pipeline",
    "op08_catalog_ddl",
    "op10_change_data_feed",
    "op45c_foreachbatch_sink",
    "op57_bucketed_join",
]

_SPECS = all_specs()


@pytest.mark.parametrize("name", _SIDE_EFFECTING)
def test_rerun_is_identical(spark, name):
    fn = _SPECS[name].fn
    first = sorted(tuple(r) for r in fn(spark, SF0001).collect())
    second = sorted(tuple(r) for r in fn(spark, SF0001).collect())
    assert first == second
    assert first  # non-empty
