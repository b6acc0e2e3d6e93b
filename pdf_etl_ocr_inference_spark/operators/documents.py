"""Document pipeline operators (SURVEY.md §2.4/2.6, OP-20..26, OP-30).

The reference's document flow: PDF → OCR (``unstructured.partition_pdf``
via Ray, ``02:223-230``) → ``chunk_by_title`` → >50-char filter →
``explode`` → chunks table.  OCR libs aren't available here (SURVEY §7
hard part a), so the parse step is an injection point: tests and the
testdata path use a deterministic token-window chunker; production
plugs a real ``parse_fn``.

Two chunker implementations with identical semantics:
- ``chunk_native``     : higher-order functions (sequence/slice/
  concat_ws) — whole-stage-codegen'd, preferred when chunking is pure
  text manipulation.
- ``chunk_map_in_pandas``: ``mapInPandas`` Arrow path — the template
  for genuinely Python-bound parse/OCR work.  Replaces Ray fan-out
  (ref ``02:178-260``): Spark tasks are the parallelism, LPT layout
  comes from ``repartitionByRange`` on the size key (ref ``02:125-129``
  rationale), and there is no driver round-trip or positional re-join.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.operators.layout import ensure_min_parallelism

# ------------------------------------------------------------------
# Deterministic token-window chunker (the test/testdata parse_fn)
# ------------------------------------------------------------------


def token_window_chunks(
    text: str, window: int = 20, stride: int = 20
) -> list[str]:
    """Split whitespace tokens into fixed windows. Deterministic and
    SQL-expressible (the DuckDB oracle mirrors it)."""
    toks = [t for t in text.split(" ") if t]
    if not toks:
        return []
    return [
        " ".join(toks[i : i + window]) for i in range(0, len(toks), stride)
    ]


def chunk_native(
    df: DataFrame,
    text_col: str = "text",
    window: int = 20,
    min_chars: int = 50,
) -> DataFrame:
    """Chunk + explode + length filter, all JVM-native.

    Mirrors the reference semantics: inner explode drops documents
    whose chunker produced nothing (ref ``02:292``), >``min_chars``
    filter applied post-chunk (ref ``02:230``).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    # Materialize the token array as a column BEFORE the transform:
    # HOF lambdas re-evaluate inlined subexpressions per element, so
    # referencing the split expression inside the lambda would re-split
    # the document once per chunk (O(len²)).  A column reference is an
    # attribute lookup — evaluated once per row.
    tc = F.col("_toks")
    n_chunks = F.ceil(F.size(tc) / F.lit(window)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(tc, i * window + 1, window)),
    )
    return (
        ensure_min_parallelism(df)
        .withColumn("_toks", toks)
        .withColumn("_chunks", chunks)
        .select(
            *[c for c in df.columns if c != text_col],
            F.posexplode("_chunks").alias("chunk_idx", "chunk"),
        )
        .filter(F.length("chunk") > min_chars)
    )


# ------------------------------------------------------------------
# mapInPandas chunker (the OCR-shaped Python path)
# ------------------------------------------------------------------

ParseFn = Callable[[str], list[str]]


def chunk_map_in_pandas(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    parse_fn: ParseFn | None = None,
    min_chars: int = 50,
    size_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed parse→chunk via ``mapInPandas`` (OP-25 replacement).

    - ``parse_fn``: document text → list of chunks.  Defaults to the
      deterministic token-window chunker; production injects the
      OCR/unstructured pipeline here (ref ``02:223-230``).
    - ``size_col``: when given, rows are range-repartitioned descending
      on it first — the reference's longest-processing-time-first
      layout (``02:125-129``) so stragglers start early.  AQE handles
      residual skew.
    - ids are carried through the fan-out, so chunks re-associate by
      key — no positional re-join (SURVEY EP-2 replacement).
    """
    fn = parse_fn or token_window_chunks

    out_fields = [df.schema[c] for c in id_cols] + [
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("chunk", T.StringType()),
    ]
    out_schema = T.StructType(out_fields)

    work = df.select(*id_cols, text_col, *([size_col] if size_col else []))
    if size_col is not None:
        n = num_partitions or work.sparkSession.sparkContext.defaultParallelism
        work = work.repartitionByRange(n, F.desc(size_col)).drop(size_col)
    else:
        work = ensure_min_parallelism(work, num_partitions)

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in out_fields}
            id_arrays = {c: pdf[c].to_numpy() for c in id_cols}
            for i, text in enumerate(pdf[text_col].to_numpy()):
                kept = [
                    (j, ch)
                    for j, ch in enumerate(fn(text))
                    if len(ch) > min_chars
                ]
                if not kept:
                    continue
                for c in id_cols:
                    rows[c].extend([id_arrays[c][i]] * len(kept))
                rows["chunk_idx"].extend(j for j, _ in kept)
                rows["chunk"].extend(ch for _, ch in kept)
            yield pd.DataFrame(rows)

    return work.mapInPandas(_chunk, schema=out_schema)


# ------------------------------------------------------------------
# Filename derivation (OP-20 lifted native)
# ------------------------------------------------------------------


def derive_filenames(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """The reference builds download filenames inside a scalar UDF
    (``01:122-143``: date slice + space→underscore + %-format).  The
    engine expresses the same derivation natively so Catalyst sees it.
    """
    return df.withColumn(
        "filename",
        F.format_string("%s/%06d.txt", F.col(source_col), F.col(id_col)),
    )
