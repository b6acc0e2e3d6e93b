#!/usr/bin/env python
"""Capture ``explain("formatted")`` for headline queries into
``plans/<round>/<query>_<tag>.txt`` — the optimization round's
plan-shape evidence (Exchange count, join strategy,
PushedFilters/ReadSchema, BatchEvalPython/ArrowEvalPython nodes).

    python tools/capture_plans.py --tag before [--round r13] [-k substring] [names...]

Notes: entries whose fn() runs eager work (staging writes, iterative
convergence, streaming run-to-completion) pay that work here; the
captured plan is the RETURNED frame's plan (for op45 that is the
memory-sink table — the streaming machinery itself has no batch plan).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", default="r13", dest="round_dir")
    ap.add_argument("-k", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import bench
    from pdf_etl_ocr_inference_spark.plans import all_specs
    from pdf_etl_ocr_inference_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    names = args.names or list(bench.BENCH_QUERIES)
    if args.k:
        names = [n for n in names if args.k in n]
    outdir = os.path.join(REPO, "plans", args.round_dir)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"plan: {name}")
        df = specs[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        el = time.perf_counter() - t0
        txt = buf.getvalue()
        n_exchange = txt.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
            )
            if j in txt
        ]
        py = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "MapInArrow", "FlatMapGroupsInPandas")
            if p in txt
        ]
        header = (
            f"== {name} @ {SF_DIR} ({args.tag}) ==\n"
            f"construct+explain: {el:.2f}s | Exchange nodes: {n_exchange} | "
            f"joins: {','.join(joins) or '-'} | python: "
            f"{','.join(py) or '-'}\n\n"
        )
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(header + txt)
        print(f"{name}: Exchange={n_exchange} joins={joins} py={py} "
              f"({el:.1f}s) -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
