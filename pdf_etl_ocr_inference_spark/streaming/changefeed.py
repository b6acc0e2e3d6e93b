"""Engine-native change data feed (SURVEY OP-10/OP-45).

The reference enables Delta CDF with a table property
(``ocr-tesseract-unstructured.py:112``) so downstream consumers sync
row-level changes incrementally (``ocr:149`` TRIGGERED index).  Open-
source Spark has no CDF without Delta on the classpath; this module
provides the same *capability* on plain parquet:

- a **versioned table layout**: ``path/v=N/`` per commit, each row
  stamped with ``_change_type`` (insert / update_preimage /
  update_postimage / delete) and ``_commit_version``;
- ``commit_changes``  : append one commit (the writer computes the
  change rows — typically a key-join diff against the previous
  snapshot, see ``diff_snapshots``);
- ``read_changes``    : all change rows with ``_commit_version >
  since`` — partition pruning on ``v=`` does the "incremental" part
  (a consumer at version N reads only new directories);
- ``snapshot``        : reconstruct the current state (latest
  post-image per key, deletes dropped) — one window per key.

Scale: commits are append-only directory writes (no rewrite of
history); ``read_changes(since)`` cost ∝ new data only; ``snapshot``
shuffles once on the key; ``compact`` folds ``v<=N`` into a base
snapshot so reconstruction cost stops growing with history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CHANGE_TYPES = (
    "insert",
    "update_preimage",
    "update_postimage",
    "delete",
)


def commit_changes(changes: DataFrame, path: str, version: int) -> None:
    """Append one commit of change rows as ``path/v=N/``.

    The version lives ONLY in the partition directory name — readers
    recover it as a partition column, and version predicates prune
    directories (a data column wouldn't).
    """
    if "v" in changes.columns:
        raise ValueError(
            "change-feed tables cannot have a data column named 'v': "
            "it collides with the v=N commit partition column"
        )
    changes.write.mode("overwrite").parquet(f"{path}/v={version}")


def diff_snapshots(
    before: DataFrame, after: DataFrame, key: str
) -> DataFrame:
    """Compute change rows between two snapshots (full outer join on
    the key): inserts, deletes, and pre/post images for updates.

    At 100 TB this is the one-shuffle-per-side reconciliation join;
    writers that KNOW their changes (upsert batches) skip it and call
    ``commit_changes`` directly.
    """
    b = before.select(
        F.col(key).alias("_k"), F.struct(*before.columns).alias("_b")
    )
    a = after.select(
        F.col(key).alias("_k2"), F.struct(*after.columns).alias("_a")
    )
    joined = b.join(a, b["_k"] == a["_k2"], "full_outer")
    inserts = joined.filter(F.col("_k").isNull()).select(
        F.col("_a.*"), F.lit("insert").alias("_change_type")
    )
    deletes = joined.filter(F.col("_k2").isNull()).select(
        F.col("_b.*"), F.lit("delete").alias("_change_type")
    )
    updated = joined.filter(
        F.col("_k").isNotNull()
        & F.col("_k2").isNotNull()
        & (F.col("_b") != F.col("_a"))
    )
    pre = updated.select(
        F.col("_b.*"), F.lit("update_preimage").alias("_change_type")
    )
    post = updated.select(
        F.col("_a.*"), F.lit("update_postimage").alias("_change_type")
    )
    return inserts.unionByName(deletes).unionByName(pre).unionByName(post)


def read_changes(
    spark: SparkSession, path: str, since_version: int = -1
) -> DataFrame:
    """Change rows with ``_commit_version > since_version``.

    ``v=N`` is a partition column → the filter prunes directories, so
    an incremental consumer reads only commits it hasn't seen.
    """
    df = spark.read.option("basePath", path).parquet(path)
    df = df.withColumnRenamed("v", "_commit_version") if "v" in df.columns else df
    return df.filter(F.col("_commit_version") > since_version)


def snapshot(
    spark: SparkSession,
    path: str,
    key: str,
    as_of_version: int | None = None,
) -> DataFrame:
    """State reconstruction: latest insert/post-image per key, minus
    keys whose latest change is a delete.

    ``as_of_version`` gives time travel — reconstruct the table as it
    was after commit N by ignoring later commit directories (partition
    pruning keeps the read proportional to history up to N).
    """
    changes = read_changes(spark, path, since_version=-1).filter(
        F.col("_change_type") != "update_preimage"
    )
    if as_of_version is not None:
        changes = changes.filter(
            F.col("_commit_version") <= as_of_version
        )
    w = Window.partitionBy(key).orderBy(F.desc("_commit_version"))
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col("_change_type") != "delete")
    )
    return latest.drop("_rn", "_change_type", "_commit_version")


def list_versions(path: str) -> list[int]:
    """Commit versions present on disk (sorted ascending)."""
    import os

    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("v=") and os.path.isdir(os.path.join(path, name)):
            out.append(int(name[2:]))
    return sorted(out)


def compact(
    spark: SparkSession, path: str, key: str, through_version: int
) -> None:
    """Fold commits ``v <= through_version`` into one base-snapshot
    commit at ``v=through_version``, removing the older directories —
    so ``snapshot()`` cost stops growing with history length.

    The base is the reconstructed state as-of ``through_version``,
    rewritten as all-``insert`` rows.  Semantics afterwards:

    - ``snapshot()`` at any ``as_of >= through_version`` is IDENTICAL
      to pre-compaction (oracle-checked by ``op10b_cdf_compaction``);
    - ``read_changes(since >= through_version)`` is untouched — those
      directories are not rewritten;
    - ``read_changes(since < through_version)`` returns the base
      insert rows plus later commits: a consumer that fell behind the
      compaction horizon gets a full re-sync (standard CDF retention
      behavior);
    - time travel below the horizon is gone by construction.

    Cost ∝ current snapshot size + history ≤ N being folded, NOT the
    total feed history; later commits are untouched.  The final
    multi-directory swap is not transactional on a plain filesystem —
    a production deployment fronts it with a manifest/log commit (the
    role Delta's transaction log plays); at this engine's layer the
    base is staged to a temp dir and moved into place last so a crash
    mid-compaction loses no committed data (the stale v<=N dirs are
    still present and a re-run is safe).
    """
    import os
    import shutil

    versions = list_versions(path)
    to_fold = [v for v in versions if v <= through_version]
    if not to_fold:
        return
    base = snapshot(spark, path, key, as_of_version=through_version)
    base = base.withColumn("_change_type", F.lit("insert"))
    tmp = os.path.join(path, f"_compact_tmp_v{through_version}")
    shutil.rmtree(tmp, ignore_errors=True)
    base.write.mode("overwrite").parquet(tmp)  # materialize BEFORE rm
    for v in to_fold:
        shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
    os.replace(tmp, os.path.join(path, f"v={through_version}"))


def maybe_compact(
    spark: SparkSession,
    path: str,
    key: str,
    max_commits: int = 16,
    keep_recent: int = 4,
) -> bool:
    """Compaction POLICY: when the feed has accumulated more than
    ``max_commits`` commit directories, fold everything except the
    ``keep_recent`` newest into a base snapshot.  Returns whether a
    compaction ran.

    Writers call this after ``commit_changes`` — amortized cost is one
    snapshot materialization every ``max_commits - keep_recent``
    commits, and ``read_changes(since)`` consumers lagging fewer than
    ``keep_recent`` commits never see a re-sync.  The knobs trade
    history (time-travel depth, consumer lag tolerance) against
    ``snapshot()`` read amplification.
    """
    versions = list_versions(path)
    if len(versions) <= max_commits:
        return False
    horizon = versions[-(keep_recent + 1)] if keep_recent else versions[-1]
    compact(spark, path, key, through_version=horizon)
    return True
