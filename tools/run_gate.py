#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` in DuckDB over the same parquet, comparing with the
SAME canonicalization the driver uses (reconstructed from its round-4
traceback): pandas DataFrames, columns sorted by name, rows sorted by
``sort_values`` over all columns, values compared at FULL precision
and dtype-sensitively.  The round-3/-4 lesson: the old replica
fetched tuples (DuckDB HUGEINT -> Python int) and normalized floats
to 6 significant digits, so it certified entries the driver then
failed on int64-vs-float64 dtype and one-ulp rounding differences.
Local green must imply driver green, so this replica is deliberately
the STRICTER of the two:

- DuckDB results come through ``.df()`` (HUGEINT -> float64, which
  is exactly how the driver sees an un-CAST integer SUM);
- floats compare bit-for-bit (NaN==NaN), no sig-digit rounding;
- integer-kind vs float-kind column dtypes are a hard mismatch;
- list/dict cells raise in ``sort_values`` exactly like the
  driver's ``factorize`` does (unhashable type), so array-typed
  output columns fail here too instead of silently tuple-izing.

    python tools/run_gate.py [--sf /root/testdata/sf0.01] [-k substring]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf):
    """Driver-shaped canonical form: name-sorted columns, row order
    normalized by sort_values over every column (raises on
    unhashable cells — intentionally, see module docstring)."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _coerce_date_objects(a, b):
    """Spark DATE columns arrive in pandas as object(datetime.date)
    while DuckDB DATE arrives as datetime64 — the one dtype-kind gap
    that is NOT driver-visible (op77_retention was driver-green in r4
    with a date column), so coerce the object side to datetime64
    before the strict compare."""
    import datetime as _dt

    import pandas as pd

    def is_dateish(s):
        if s.dtype.kind != "O":
            return False
        nn = s.dropna()
        return len(nn) > 0 and all(
            isinstance(v, (_dt.date, _dt.datetime)) for v in nn.head(5)
        )

    if a.dtype.kind == "O" and b.dtype.kind == "M" and is_dateish(a):
        a = pd.to_datetime(a)
    if b.dtype.kind == "O" and a.dtype.kind == "M" and is_dateish(b):
        b = pd.to_datetime(b)
    return a, b


def _col_equal(a, b) -> bool:
    """Full-precision, dtype-kind-sensitive column compare."""
    import numpy as np
    import pandas as pd

    a, b = _coerce_date_objects(a, b)
    ka, kb = a.dtype.kind, b.dtype.kind
    if {ka, kb} <= {"i", "u"}:
        return np.array_equal(a.to_numpy(), b.to_numpy())
    if ka == kb and ka in ("M", "m"):
        # same-kind datetime/datetime or timedelta/timedelta only:
        # unit (ns vs us) is storage, not value.  A datetime-vs-
        # timedelta mix must fall through to the kind-mismatch branch
        # (numpy comparison across M/m raises, surfacing as ERROR).
        return bool((pd.isna(a).to_numpy() == pd.isna(b).to_numpy()).all()) and bool(
            (a[~pd.isna(a)].astype("datetime64[ns]" if ka == "M" else "timedelta64[ns]").to_numpy()
             == b[~pd.isna(b)].astype("datetime64[ns]" if kb == "M" else "timedelta64[ns]").to_numpy()).all()
        )
    if ka != kb:
        return False  # int64 vs float64 etc. — the driver's hash differs
    if ka == "f":
        return np.array_equal(a.to_numpy(), b.to_numpy(), equal_nan=True)
    if ka == "b":
        return np.array_equal(a.to_numpy(), b.to_numpy())
    # object (strings, decimals, bytes): exact equality, NaN/None match
    na, nb = pd.isna(a).to_numpy(), pd.isna(b).to_numpy()
    if not (na == nb).all():
        return False
    return bool((a[~na].to_numpy() == b[~nb].to_numpy()).all())


def _compare(spdf, dpdf) -> str | None:
    """None if equal, else a short reason string."""
    if sorted(spdf.columns) != sorted(dpdf.columns):
        return f"cols {sorted(spdf.columns)} != {sorted(dpdf.columns)}"
    if len(spdf) != len(dpdf):
        return f"rows {len(spdf)} != {len(dpdf)}"
    s, d = _canon(spdf), _canon(dpdf)
    for c in s.columns:
        sc, dc = _coerce_date_objects(s[c], d[c])
        if sc.dtype.kind != dc.dtype.kind and not (
            {sc.dtype.kind, dc.dtype.kind} <= {"i", "u"}
        ):
            return (
                f"dtype[{c}] {sc.dtype} != {dc.dtype} "
                "(driver hash is dtype-sensitive)"
            )
        if not _col_equal(sc, dc):
            return f"values[{c}] differ at full precision"
    return None


def _run_one_sf(spark, entry, sf: str, k: str) -> tuple:
    """(matched, rows_only, fails) for one SF dir.  Oracles are
    re-resolved per SF: lazy oracles (corpus-derived literals, e.g.
    ann_pca_project) read SPARK_GRAFT_ORACLE_SF_DIR at resolve time."""
    import duckdb

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    matched, rows_only, fails = 0, 0, []
    for name, fn in sorted(qs.items()):
        if k and not any(s and s in name for s in k.split(",")):
            continue
        t0 = time.perf_counter()
        why = ""
        try:
            df = fn(spark, sf)
            spdf = df.toPandas()
            if name in oracles:
                dpdf = con.execute(oracles[name]).df()
                reason = _compare(spdf, dpdf)
                ok = reason is None
                status = "MATCH    " if ok else "MISMATCH "
                why = "" if ok else f" [{reason}]"
                matched += ok
                if not ok:
                    fails.append(name)
            else:
                # the driver still canonicalizes rows-only entries —
                # replicate so unhashable cells fail here first
                _canon(spdf)
                status = "rows-only"
                rows_only += 1
        except Exception as ex:  # noqa: BLE001
            status = f"ERROR {str(ex)[:120]}"
            fails.append(name)
        print(f"{status} {name} ({time.perf_counter() - t0:.1f}s){why}")
    con.close()
    return matched, rows_only, fails


_ALL_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "-k", default="",
        help="only queries containing this (comma = any-of)",
    )
    ap.add_argument(
        "--all-sfs",
        action="store_true",
        help="run the gate at sf0.001, sf0.01 AND sf0.1 (the r7 "
        "three-SF certification — sf0.001 caught a ROUND-tie bug "
        "the driver's SFs never would) and print one summary line "
        "per SF",
    )
    args = ap.parse_args()
    warnings.filterwarnings("ignore")

    import importlib

    entry = importlib.import_module("__spark_entry__")
    from pdf_etl_ocr_inference_spark.session import get_spark

    spark = get_spark(app_name="gate")
    spark.sparkContext.setLogLevel("ERROR")

    sfs = _ALL_SFS if args.all_sfs else [args.sf]
    summaries, any_fail = [], False
    for sf in sfs:
        if len(sfs) > 1:
            print(f"\n=== {sf} ===")
        matched, rows_only, fails = _run_one_sf(spark, entry, sf, args.k)
        any_fail = any_fail or bool(fails)
        line = (
            f"gate[{sf.rsplit('/', 1)[-1]}]: {matched} matched, "
            f"{rows_only} rows-only, {len(fails)} failed"
            f"{': ' + ', '.join(fails) if fails else ''}"
        )
        summaries.append(line)
        print(f"\n{line}")
    if len(summaries) > 1:
        print("\n=== three-SF certification ===")
        for line in summaries:
            print(line)
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
