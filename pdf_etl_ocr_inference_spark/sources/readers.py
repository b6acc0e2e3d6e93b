"""Explicit-schema readers (SURVEY.md §2.1, OP-01/04/07).

The reference reads CSV header-only with no inferSchema
(``01-download-pdfs.py:64``) so every column lands as string — that is
bug-shaped behavior we reproduce only behind ``legacy_inference=True``.
Default path: caller supplies a ``StructType``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    multi_line: bool = False,
    legacy_inference: bool = False,
) -> DataFrame:
    """CSV scan (OP-01).

    ``multi_line=True`` subsumes the reference's manual newline scrub
    (``01:49-55`` rewrote the file to strip embedded newlines; the CSV
    reader handles quoted newlines natively).
    ``legacy_inference=True`` reproduces ``01:64``: header only, every
    column StringType.
    """
    reader = spark.read.option("header", header)
    if multi_line:
        reader = reader.option("multiLine", True).option("escape", '"')
    if legacy_inference:
        return reader.csv(path)  # all-string columns, like the reference
    if schema is None:
        raise ValueError("pass an explicit schema or legacy_inference=True")
    return reader.schema(schema).csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (OP-02 for file-backed tables)."""
    return spark.read.parquet(path)


def read_json_lines(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan (extension surface; the events.props fixture
    exercises in-row JSON via get_json_object instead)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_binary_dir(
    spark: SparkSession, path: str, glob: str = "*.pdf"
) -> DataFrame:
    """Binary-blob source (OP-06/07 replacement).

    The reference globs a volume driver-side (``ocr-tesseract-
    unstructured.py:55-61``); the distributed equivalent is the
    ``binaryFile`` source: ``path, modificationTime, length, content``
    — length drives LPT ordering without opening files.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def from_rows(
    spark: SparkSession, rows: list, schema: T.StructType | list[str] | None = None
) -> DataFrame:
    """Local-collection source (OP-04, ``ocr:105`` createDataFrame).

    Only for small control/dimension data — the engine rule (SURVEY
    §4.3) is that bulk data never round-trips through the driver.
    """
    return spark.createDataFrame(rows, schema=schema)
