#!/usr/bin/env python
"""Double-run every rows-only catalog entry and compare value hashes.

The driver's correctness gate can only check rows-only entries by row
count, so value-level nondeterminism (float shuffle sums, unordered
collect_list, RNG) would drift silently.  This tool runs each entry
twice in one session and hashes the full sorted result — any mismatch
is a bug of the op06-staleness class.

    python tools/check_determinism.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    warnings.filterwarnings("ignore")

    import importlib

    entry = importlib.import_module("__spark_entry__")
    from pdf_etl_ocr_inference_spark.session import get_spark

    spark = get_spark(app_name="detcheck")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    rows_only = sorted(set(qs) - set(oracles))
    bad = []
    for name in rows_only:
        hashes = []
        for _ in range(2):
            df = qs[name](spark, args.sf)
            rows = sorted(
                repr(sorted((c, r[c]) for c in df.columns))
                for r in df.collect()
            )
            hashes.append(
                hashlib.sha256("\n".join(rows).encode()).hexdigest()[:12]
            )
        ok = hashes[0] == hashes[1]
        if not ok:
            bad.append(name)
        print(f"{'OK    ' if ok else 'NONDET'} {name} {hashes}")
    print(f"\n{len(rows_only)} rows-only entries, {len(bad)} nondeterministic"
          f"{': ' + ', '.join(bad) if bad else ''}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
