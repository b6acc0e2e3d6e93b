"""The local gate replica's canonicalization contract
(tools/run_gate.py) — the module that decides "local green ⇒ driver
green".  Each test pins one failure class the driver exhibited in
rounds 3-4, so a future refactor cannot silently un-strict the
replica:

- int64 vs float64 column dtype (the HUGEINT class) is a MISMATCH;
- a one-ulp float difference is a MISMATCH (no 6-sig-digit
  forgiveness — the op92b class);
- list cells raise like the driver's factorize (the
  ann_pca_project class);
- Spark DATE (object of datetime.date) vs DuckDB DATE (datetime64)
  is the one deliberately-allowed coercion (op77 was driver-green);
- plain equal frames in scrambled row/column order MATCH.
"""

from __future__ import annotations

import datetime
import importlib.util
import pathlib
import sys

import pandas as pd
import pytest

_TOOLS = pathlib.Path(__file__).resolve().parents[1] / "tools"


@pytest.fixture(scope="module")
def gate():
    spec = importlib.util.spec_from_file_location(
        "run_gate", _TOOLS / "run_gate.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["run_gate"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_equal_frames_in_any_order_match(gate):
    a = pd.DataFrame({"k": [1, 2, 3], "v": ["x", "y", "z"]})
    b = pd.DataFrame({"v": ["z", "x", "y"], "k": [3, 1, 2]})
    assert gate._compare(a, b) is None


def test_int_vs_float_dtype_mismatches(gate):
    # the HUGEINT class: DuckDB HUGEINT -> pandas float64 while
    # Spark's long sum is int64 — identical VALUES must still fail
    a = pd.DataFrame({"k": [1, 2], "s": pd.array([10, 20], dtype="int64")})
    b = pd.DataFrame({"k": [1, 2], "s": pd.array([10.0, 20.0], dtype="float64")})
    reason = gate._compare(a, b)
    assert reason is not None and "dtype" in reason


def test_int_width_difference_allowed(gate):
    # int32 vs int64 was driver-green in r4 (op34c ranks) — kinds
    # {i,u} are interchangeable
    a = pd.DataFrame({"k": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"k": pd.array([1, 2], dtype="int64")})
    assert gate._compare(a, b) is None


def test_one_ulp_float_difference_mismatches(gate):
    import math

    x = 134490.226
    a = pd.DataFrame({"v": [x]})
    b = pd.DataFrame({"v": [math.nextafter(x, 2 * x)]})
    reason = gate._compare(a, b)
    assert reason is not None and "full precision" in reason
    # and NaN == NaN (driver hashes a canonical NaN)
    c = pd.DataFrame({"v": [float("nan")]})
    d = pd.DataFrame({"v": [float("nan")]})
    assert gate._compare(c, d) is None


def test_list_cells_raise_like_the_driver(gate):
    # the r4 traceback came from pandas' MULTI-column lexsort
    # (Categorical/factorize on the list column) — the shape
    # ann_pca_project actually had (id + array column)
    a = pd.DataFrame({"id": [1, 2], "v": [[1.0, 2.0], [3.0, 4.0]]})
    with pytest.raises(TypeError):
        gate._canon(a)


def test_date_object_vs_datetime64_allowed(gate):
    a = pd.DataFrame(
        {"d": [datetime.date(2026, 1, 1), datetime.date(2026, 2, 1)]}
    )
    b = pd.DataFrame(
        {"d": pd.to_datetime(["2026-01-01", "2026-02-01"]).astype(
            "datetime64[us]"
        )}
    )
    assert gate._compare(a, b) is None
    # but a VALUE difference under the coercion still fails
    c = pd.DataFrame({"d": [datetime.date(2026, 1, 2)]})
    d = pd.DataFrame(
        {"d": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]")}
    )
    assert gate._compare(c, d) is not None


def test_row_count_and_column_set_mismatches(gate):
    a = pd.DataFrame({"k": [1, 2]})
    assert gate._compare(a, pd.DataFrame({"k": [1]})) is not None
    assert gate._compare(a, pd.DataFrame({"j": [1, 2]})) is not None
