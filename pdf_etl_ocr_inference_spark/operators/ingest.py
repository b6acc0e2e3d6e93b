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

try:  # public HTTP client; stdlib urllib is the fallback
    import requests as _requests
except ImportError:  # pragma: no cover - requests is normally present
    _requests = None

# fetch_fn(url, dest_path) -> None; raises on failure
FetchFn = Callable[[str, str], None]


def _copy_fetch(url: str, dest: str) -> None:
    """Default fetcher: resolve file:// URLs by copy (hermetic)."""
    if not url.startswith("file://"):
        raise ValueError(f"default fetcher handles file:// only, got {url!r}")
    shutil.copyfile(url[len("file://") :], dest)


class HttpStatusError(RuntimeError):
    """Non-2xx response; ``status`` preserved for retry classification."""

    def __init__(self, url: str, status: int):
        super().__init__(f"GET {url} -> HTTP {status}")
        self.status = status


def make_http_fetch(
    timeout: float = 30.0,
    retries: int = 3,
    backoff_s: float = 0.5,
    retry_statuses: tuple[int, ...] = (429, 500, 502, 503, 504),
    user_agent: str = "pdf-etl-ocr-inference-spark/ingest",
) -> FetchFn:
    """Production HTTP fetcher for :func:`fetch_blobs`.

    Reference semantics (``01-download-pdfs.py:89-120``): GET the URL,
    stream the body to ``dest``, treat any non-200 as failure — which
    ``fetch_blobs`` converts to a null row rather than a task failure.
    Hardening on top of the reference:

    - **connection reuse**: one ``requests.Session`` per Python worker
      process, created lazily inside the closure and reused across
      rows, Arrow batches, and tasks (worker processes are long-lived);
      falls back to stdlib ``urllib`` when requests is unavailable;
    - **bounded retry**: transient failures (connect/timeout errors and
      ``retry_statuses``) retry up to ``retries`` times with exponential
      backoff (``backoff_s * 2**attempt``); permanent statuses (404,
      403, ...) raise immediately — retrying them wastes cluster time;
    - **atomic writes**: body streams to ``dest.part.<pid>`` then
      ``os.replace`` — a killed task can never leave a truncated blob
      that the exists-check would later treat as complete.
    """
    retry_set = frozenset(retry_statuses)
    state: dict = {}

    def _write_atomic(dest: str, chunks) -> None:
        tmp = f"{dest}.part.{os.getpid()}"
        try:
            with open(tmp, "wb") as f:
                for chunk in chunks:
                    if chunk:
                        f.write(chunk)
            os.replace(tmp, dest)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    def _get_once(url: str, dest: str) -> None:
        """Single attempt; raises HttpStatusError / connection errors."""
        if _requests is not None:
            sess = state.get("session")
            if sess is None:
                sess = _requests.Session()
                sess.headers["User-Agent"] = user_agent
                state["session"] = sess
            with sess.get(url, timeout=timeout, stream=True) as r:
                if r.status_code != 200:
                    raise HttpStatusError(url, r.status_code)
                _write_atomic(dest, r.iter_content(chunk_size=1 << 16))
        else:  # pragma: no cover - exercised only without requests
            import urllib.error
            import urllib.request

            req = urllib.request.Request(
                url, headers={"User-Agent": user_agent}
            )
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    _write_atomic(
                        dest, iter(lambda: resp.read(1 << 16), b"")
                    )
            except urllib.error.HTTPError as e:
                raise HttpStatusError(url, e.code) from e

    def fetch(url: str, dest: str) -> None:
        import time

        last: Exception | None = None
        for attempt in range(retries + 1):
            if attempt:
                time.sleep(backoff_s * (2 ** (attempt - 1)))
            try:
                _get_once(url, dest)
                return
            except HttpStatusError as e:
                if e.status not in retry_set:
                    raise  # permanent → null row upstream, no retry
                last = e
            except Exception as e:  # connect/timeout: transient
                last = e
        assert last is not None
        raise last

    return fetch


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
