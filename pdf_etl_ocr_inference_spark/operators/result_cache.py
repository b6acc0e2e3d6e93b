"""Persistent query-result cache — the warehouse result-cache /
automatic-materialization feature (Snowflake result reuse, Databricks
disk cache's logical cousin), engine-native over plain parquet.

A result is keyed by a **semantic fingerprint** of the query:

- the CANONICALIZED logical plan (Catalyst's own plan-equality
  normalization: expression ids and cosmetic aliases erased, so two
  sessions or two spellings of the same query agree), plus
- ``DataFrame.semanticHash()`` (guards plan details the canonical
  string elides), plus
- the source **file inventory with sizes and mtimes**
  (``DataFrame.inputFiles()``): any rewrite of any input file changes
  the key, so a cache entry can never silently serve stale data —
  the invalidation rule Snowflake applies via table versions, done
  here with file metadata because plain parquet has no version.

Storage: ``{root}/result_cache/{fingerprint}/`` holding the result
parquet plus a ``_manifest.json`` written tmp-then-``os.replace``
LAST (the repo-wide atomic-publish discipline — a crash mid-write
leaves a missing manifest, i.e. a cache MISS, never a torn entry).

Scale shape: the fingerprint is driver-side metadata work (hashing
~100k file entries at 100 TB is milliseconds); hit serving is one
parquet scan of the RESULT (small for aggregates — the case result
caches exist for); the cache directory is shared control data, safe
for concurrent writers because distinct queries land in distinct
fingerprint dirs and identical concurrent queries race benignly to
publish identical bytes.

No counterpart in the reference (its notebooks re-run every cell);
this generalizes the materialized-view family (``streaming/ivm.py``)
to ad-hoc queries.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame


def _canon_file_url(p: str) -> str:
    """``file:///x``, ``file://x`` and ``file:/x`` all name local
    ``/x`` — collapse to ``file:/x``.  Hadoop's ``Path.toString``
    (the index keys) and ``DataFrame.inputFiles()`` disagree on the
    slash count, and before r9 that mismatch made EVERY per-file
    ``(size, mtime)`` lookup miss silently, so the fingerprint's
    byte-edit sensitivity existed only in its docstring."""
    if p.startswith("file:"):
        return "file:/" + p[len("file:"):].lstrip("/")
    return p


def _plan_file_index(df: DataFrame) -> list:
    """``(path, size, listing-mtime-ms)`` per input file, read from
    the plan's ALREADY-MATERIALIZED file index (Spark listed and
    stat'ed the files when the relation was resolved — this walk is
    pure py4j accessor calls, zero filesystem I/O).  Empty on
    non-file relations or any JVM-shape surprise (callers fall back
    to names-only)."""
    out = []
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.nodeName() == "LogicalRelation":
                it = node.relation().location().allFiles().iterator()
                while it.hasNext():
                    f = it.next()
                    out.append(
                        (
                            _canon_file_url(f.getPath().toString()),
                            int(f.getLen()),
                            int(f.getModificationTime()),
                        )
                    )
            ch = node.children()
            for i in range(ch.length()):
                stack.append(ch.apply(i))
    except Exception:  # noqa: BLE001 — fingerprint must never raise
        return []
    return out


def plan_fingerprint(df: DataFrame) -> str:
    """Stable hex fingerprint of (canonicalized plan, semantic hash,
    input-file NAMES + per-file (size, listing mtime) from the
    plan's materialized file index, per-source-directory mtime).

    Everything file-shaped comes from the plan's already-materialized
    file index (Spark listed the files when the DataFrame was built —
    no extra I/O), and the only fresh syscall is ONE os.stat per
    distinct source directory instead of one per file (r7, same
    doctrine as the layout freshness probe: at 10⁶ files the
    per-file stat pass was a control-plane scale-killer).
    Correctness under the immutable-data-file convention: every
    Spark write produces fresh uuid file names, so any rewrite
    changes the NAME set; an append/delete/rename also bumps the
    directory mtime; and (r8, advice) an in-place rewrite that
    preserves name/count/dir-mtime is still caught whenever it
    changes the file's size or mtime AS OF THE PLAN'S LISTING —
    the index sizes come for free, narrowing the undetected-mutation
    window to a same-size same-listing-mtime byte edit."""
    jq = df._jdf.queryExecution()
    canon = jq.analyzed().canonicalized().toString()
    h = hashlib.sha256()
    h.update(canon.encode())
    h.update(str(df.semanticHash()).encode())
    indexed = {p: (sz, mt) for p, sz, mt in _plan_file_index(df)}
    dirs = set()
    for f in sorted(_canon_file_url(p) for p in df.inputFiles()):
        sz, mt = indexed.get(f, (-1, -1))
        h.update(f"{f}:{sz}:{mt}".encode())
        local = f[len("file:"):] if f.startswith("file:") else f
        dirs.add(os.path.dirname(local))
    for d in sorted(dirs):
        try:
            st = os.stat(d)
            h.update(f"{d}:{st.st_mtime_ns}".encode())
        except OSError:
            h.update(f"{d}:?".encode())  # non-local / vanished dir
    return h.hexdigest()[:32]


def _default_root() -> str:
    from pdf_etl_ocr_inference_spark.scratch import scratch_root

    return os.path.join(scratch_root(), "result_cache")


def cached_result(
    df: DataFrame,
    root: str | None = None,
) -> tuple[DataFrame, bool]:
    """Return ``(result_df, hit)``: the materialized result of ``df``,
    served from the cache when a committed entry exists for its
    fingerprint, else computed, published, and served from the fresh
    entry.  Both paths return a DataFrame backed by the cache parquet,
    so downstream reuse never recomputes the plan either way."""
    spark = df.sparkSession
    root = root or _default_root()
    fp = plan_fingerprint(df)
    entry = os.path.join(root, fp)
    manifest = os.path.join(entry, "_manifest.json")
    data = os.path.join(entry, "data")
    if os.path.exists(manifest):
        return spark.read.parquet(data), True

    import uuid

    os.makedirs(entry, exist_ok=True)
    # unique tmp: two racing computations of the SAME query (threads,
    # or non-PID-keyed roots) stage independently; last publish wins
    # with identical bytes
    tmp = os.path.join(entry, f"_data_tmp_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(data, ignore_errors=True)
    os.replace(tmp, data)
    mtmp = manifest + f".tmp_{uuid.uuid4().hex[:8]}"
    with open(mtmp, "w") as f:
        json.dump({"fingerprint": fp, "schema": df.schema.jsonValue()}, f)
    os.replace(mtmp, manifest)
    return spark.read.parquet(data), False


def invalidate(df_or_fp, root: str | None = None) -> bool:
    """Drop the cache entry for a DataFrame (or raw fingerprint).
    Returns whether an entry existed."""
    root = root or _default_root()
    fp = (
        df_or_fp
        if isinstance(df_or_fp, str)
        else plan_fingerprint(df_or_fp)
    )
    entry = os.path.join(root, fp)
    existed = os.path.exists(os.path.join(entry, "_manifest.json"))
    shutil.rmtree(entry, ignore_errors=True)
    return existed
