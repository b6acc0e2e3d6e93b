"""Sinks (SURVEY.md §2.1, OP-03/05).

Reference: ``.write.mode('overwrite').saveAsTable(t)`` three times
(``01:180-182``, ``02:294-296``, ``ocr:107-109``).  OSS equivalent is
parquet ``saveAsTable`` / directory writes, with optional partitioning
for scale (a 100 TB chunks table wants partitioning by a stable key so
downstream readers prune).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def drop_managed_table(spark: SparkSession, db: str, name: str) -> None:
    """DROP TABLE IF EXISTS plus removal of a stale table *location*.

    A managed-table dir left by a previous session isn't in this
    session's in-memory catalog, so DROP TABLE alone won't clear it
    and a subsequent managed write refuses (LOCATION_ALREADY_EXISTS).
    """
    spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = os.path.join(
        warehouse.removeprefix("file:"), f"{db}.db", name
    )
    if os.path.exists(leftover):
        shutil.rmtree(leftover)


def overwrite_table(
    df: DataFrame,
    name: str,
    partition_by: list[str] | None = None,
) -> None:
    """OP-03: full-replace managed table."""
    w = df.write.mode("overwrite").format("parquet")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.saveAsTable(name)


def overwrite_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> None:
    """OP-03 variant writing to a path (object-store friendly)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def collect_small(df: DataFrame, max_rows: int = 100_000) -> list:
    """OP-05 collect-to-driver, guarded.

    The reference collects the whole corpus to the driver
    (``02:129-130``); the engine allows collect only for bounded
    control data and fails loudly otherwise.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"collect_small: result exceeds {max_rows} rows; "
            "use a distributed sink instead"
        )
    return rows
