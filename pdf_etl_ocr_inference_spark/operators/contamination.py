"""Benchmark-contamination detection (training-data pipeline op).

Before a corpus becomes LLM training data, documents that overlap an
evaluation benchmark must be found (and usually dropped) — otherwise
eval scores measure memorization.  The standard public method (GPT-3
appendix C / PaLM / Llama reports) is word-n-gram overlap: a document
is contaminated to the degree its n-grams appear in the benchmark's
n-gram set.

Spark shape, and why it scales:
- benchmark suites are FIXED-SIZE (thousands of questions, not
  corpus-sized), so the distinct benchmark n-gram set is
  schema-bounded → ``broadcast`` join, zero shuffle of the corpus;
- the corpus side is explode → broadcast-hash left join → one
  combinable groupBy on the doc id.  At 100 TB the only wide exchange
  is the per-doc aggregation, partial-aggregated map-side.
- n-grams come from ``functions.text.word_ngrams`` (native HOFs, no
  Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.functions.text import word_ngrams


def benchmark_ngrams(
    bench: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct word-``n``-gram set of a benchmark corpus → one
    ``gram`` column.  Small by construction (benchmarks are bounded);
    callers broadcast it."""
    return (
        bench.select(
            F.explode(F.array_distinct(word_ngrams(text_col, n))).alias(
                "gram"
            )
        )
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per-document benchmark overlap: ``n_grams`` (distinct n-grams in
    the doc), ``n_matched`` (of those, how many appear anywhere in the
    benchmark), ``contamination`` = matched/total.

    Every input doc yields exactly one output row (docs shorter than
    ``n`` tokens count their single catch-all shingle), so row counts
    are stable for gating; downstream filters on ``contamination``.
    """
    bench_set = benchmark_ngrams(bench, text_col, n).withColumn(
        "_hit", F.lit(1)
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("gram"),
    )
    return (
        doc_grams.join(F.broadcast(bench_set), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_matched") / F.col("n_grams"), 6),
        )
    )
