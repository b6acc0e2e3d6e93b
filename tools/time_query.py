#!/usr/bin/env python
"""Isolated per-query timing (guide §1): best/median of N reps of a
catalog entry at $SPARK_GRAFT_SF_DIR, timed with the same count()
action the bench uses (add --noop for the noop-sink variant), with the
load_reference normalizer printed so runs are comparable.

    python tools/time_query.py [--reps 5] [--noop] name [name...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import bench
    from pdf_etl_ocr_inference_spark.plans import all_specs
    from pdf_etl_ocr_inference_spark.session import _cpus, get_spark

    spark = get_spark(app_name="time_query")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    # same warmup as bench
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    spark.range(0, 1024, 1, _cpus()).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    norm = bench.load_reference(spark)
    print(f"load_reference_s={norm} (pinned {bench.LOAD_REF_BASELINE_S})")
    for name in args.names:
        ts = []
        rows = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"time: {name}")
            t0 = time.perf_counter()
            df = specs[name].fn(spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                rows = df.count()
            ts.append(time.perf_counter() - t0)
        print(
            f"{name}: median {statistics.median(ts):.3f}s "
            f"min {min(ts):.3f}s reps={[round(t, 3) for t in ts]} "
            f"rows={rows}"
        )
    norm2 = bench.load_reference(spark)
    print(f"load_reference_s end={norm2}")
    spark.stop()


if __name__ == "__main__":
    main()
