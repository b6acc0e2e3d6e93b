"""Replicate the driver's correctness gate locally: run every catalog
query on Spark AND its DuckDB oracle, compare row count, column names,
and values (order-insensitive, float-tolerant).

Catches alias/rounding/semantic mismatches before the driver does.
Runs at sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pdf_etl_ocr_inference_spark.plans import all_specs

from .conftest import SF0001

_SPECS = all_specs()
_ORACLE_NAMES = sorted(n for n, s in _SPECS.items() if s.oracle is not None)
_ROWS_ONLY_NAMES = sorted(n for n, s in _SPECS.items() if s.oracle is None)

_TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in _TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF0001}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, then rows; stringify for stable compare
    with float rounding."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6g}"
        if isinstance(v, list):
            return tuple(norm_val(x) for x in v)
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_match(spark, duck, name, monkeypatch):
    from pdf_etl_ocr_inference_spark.plans.registry import resolve_oracle

    # lazy oracles (corpus-derived literals) must target this SF
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", SF0001)
    spec = _SPECS[name]
    sdf = spec.fn(spark, SF0001)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(resolve_oracle(spec.oracle))
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sn = _normalize(spark_rows, spark_cols)
    dn = _normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", _ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    spec = _SPECS[name]
    sdf = spec.fn(spark, SF0001)
    rows = sdf.collect()
    assert rows is not None
    # stable schema
    assert len(sdf.columns) > 0
