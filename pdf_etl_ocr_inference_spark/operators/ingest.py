"""Blob-ingest operator: the reference's EP-1 pipeline (SURVEY §3),
re-expressed Spark-first.

Reference flow (``01-download-pdfs.py:174-183``): metadata CSV →
select/limit/filter → scalar UDF downloads each PDF over HTTP inside
``withColumn`` (``01:89-143``) → second UDF stats the file size
(``01:145-160``, null on failure) → ``saveAsTable('papers')``.

Engine differences, same capability:
- the filename derivation is native SQL (OP-20 lifted, §2.11);
- the side-effecting fetch runs in ``mapInPandas`` with one fetcher
  per Arrow batch (connection reuse — a scalar UDF would re-setup per
  row), returning (path, size, ok) so failure is data, not exception;
- **idempotence**: an exists-check skips completed fetches, making
  task retries safe (the reference's guard at ``01:100-101``);
  side-effecting stages MUST be retry-idempotent because Spark
  re-executes failed/speculated tasks.

``fetch_fn`` is the injection point (production: HTTP client with
timeout/backoff); the default resolves ``file://`` URLs by copying —
hermetic for tests, byte-faithful in shape.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.operators.layout import ensure_min_parallelism

# fetch_fn(url, dest_path) -> None; raises on failure
FetchFn = Callable[[str, str], None]


def _copy_fetch(url: str, dest: str) -> None:
    """Default fetcher: resolve file:// URLs by copy (hermetic)."""
    if not url.startswith("file://"):
        raise ValueError(f"default fetcher handles file:// only, got {url!r}")
    shutil.copyfile(url[len("file://") :], dest)


FETCH_RESULT_FIELDS = [
    T.StructField("filename", T.StringType()),
    T.StructField("filesize", T.LongType()),
    T.StructField("fetch_ok", T.BooleanType()),
]


def fetch_blobs(
    df: DataFrame,
    url_col: str,
    dest_col: str,
    id_cols: tuple[str, ...],
    fetch_fn: FetchFn | None = None,
) -> DataFrame:
    """OP-06: fetch each row's blob to its destination path.

    Output: id columns + ``filename`` (null on failure, matching the
    reference's nullable contract at ``01:141-143``), ``filesize``
    (null on failure, ``01:156-159``), ``fetch_ok``.
    """
    fn = fetch_fn or _copy_fetch
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + FETCH_RESULT_FIELDS
    )

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task client init would go here (amortized across batches)
        for pdf in batches:
            names, sizes, oks = [], [], []
            for url, dest in zip(pdf[url_col], pdf[dest_col]):
                try:
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    if not os.path.exists(dest):  # idempotent on retry
                        fn(url, dest)
                    names.append(dest)
                    sizes.append(os.path.getsize(dest))
                    oks.append(True)
                except Exception:
                    names.append(None)
                    sizes.append(None)
                    oks.append(False)
            out = pd.DataFrame({c: pdf[c].to_numpy() for c in id_cols})
            out["filename"] = names
            out["filesize"] = pd.array(sizes, dtype="Int64")
            out["fetch_ok"] = oks
            yield out

    work = ensure_min_parallelism(
        df.select(*id_cols, url_col, dest_col)
    )
    return work.mapInPandas(_fetch, schema=out_schema)
