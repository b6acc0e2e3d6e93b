"""CLI: run catalog queries from the command line.

    python -m pdf_etl_ocr_inference_spark list
    python -m pdf_etl_ocr_inference_spark run tpch_q1 [--sf DIR] [-n 20]
    python -m pdf_etl_ocr_inference_spark explain tpch_q5 [--sf DIR]
    python -m pdf_etl_ocr_inference_spark oracle tpch_q1   # print SQL
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pdf_etl_ocr_inference_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries")

    for cmd in ("run", "explain", "oracle"):
        sp = sub.add_parser(cmd)
        sp.add_argument("query")
        if cmd != "oracle":
            sp.add_argument(
                "--sf",
                default="/root/testdata/sf0.01",
                help="scale-factor data dir",
            )
        if cmd == "run":
            sp.add_argument("-n", type=int, default=20, help="rows to show")

    args = p.parse_args(argv)

    from pdf_etl_ocr_inference_spark.plans import all_specs

    specs = all_specs()

    if args.cmd == "list":
        for name, spec in sorted(specs.items()):
            kind = "oracle   " if spec.oracle else "rows-only"
            print(f"{kind}  {name}")
        return 0

    if args.query not in specs:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    spec = specs[args.query]

    if args.cmd == "oracle":
        if spec.oracle is None:
            print("(rows-only: no SQL oracle)", file=sys.stderr)
            return 1
        from pdf_etl_ocr_inference_spark.plans.registry import (
            resolve_oracle,
        )

        print(resolve_oracle(spec.oracle))
        return 0

    from pdf_etl_ocr_inference_spark.session import get_spark

    spark = get_spark(app_name=f"cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spec.fn(spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.n, truncate=60)
        print(f"({df.count()} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
