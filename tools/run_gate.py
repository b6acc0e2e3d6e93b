#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` in DuckDB over the same parquet, comparing column
names (sorted), row count, and order-insensitive normalized values
(floats to 6 significant digits).

    python tools/run_gate.py [--sf /root/testdata/sf0.01] [-k substring]
"""

from __future__ import annotations

import argparse
import math
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


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.6g}"
        if isinstance(v, list):
            return tuple(nv(x) for x in v)
        return v

    return sorted(
        [tuple(nv(r[i]) for i in order) for r in rows], key=repr
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-k", default="", help="only queries containing this")
    args = ap.parse_args()
    warnings.filterwarnings("ignore")

    import importlib

    import duckdb

    entry = importlib.import_module("__spark_entry__")
    from pdf_etl_ocr_inference_spark.session import get_spark

    spark = get_spark(app_name="gate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    matched, rows_only, fails = 0, 0, []
    for name, fn in sorted(qs.items()):
        if args.k and args.k not in name:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, args.sf)
            srows = [tuple(r) for r in df.collect()]
            if name in oracles:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                ok = (
                    sorted(df.columns) == sorted(dcols)
                    and len(srows) == len(drows)
                    and _normalize(srows, df.columns)
                    == _normalize(drows, dcols)
                )
                status = "MATCH    " if ok else "MISMATCH "
                matched += ok
                if not ok:
                    fails.append(name)
            else:
                status = "rows-only"
                rows_only += 1
        except Exception as ex:  # noqa: BLE001
            status = f"ERROR {str(ex)[:120]}"
            fails.append(name)
        print(f"{status} {name} ({time.perf_counter() - t0:.1f}s)")
    print(
        f"\ngate: {matched} matched, {rows_only} rows-only, "
        f"{len(fails)} failed{': ' + ', '.join(fails) if fails else ''}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
