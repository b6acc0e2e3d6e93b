"""Text-analysis query catalog (training-data pipeline extensions:
token counting, quality scoring, language-ID, fingerprinting).

Every op here is implemented natively in Spark AND mirrored in DuckDB
SQL, so the driver's oracle verifies them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.functions.text import (
    _LANG_MARKERS,
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t


@register(
    "text_token_count",
    "SELECT doc_id, "
    "LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS n_tokens "
    "FROM documents",
    doc="whitespace token counting over the documents table.",
)
def text_token_count(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )


@register(
    "text_quality_score",
    """
    SELECT doc_id, (
        (LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g'))
         / GREATEST(LENGTH(text), 1))
      + (CASE WHEN LENGTH(text) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END)
      + (CASE WHEN
            (LENGTH(text) - LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) + 1)
              / GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')), 1)
            BETWEEN 2.0 AND 12.0
         THEN 1.0 ELSE 0.0 END)
    ) / 3.0 AS quality FROM documents
    """,
    doc="heuristic quality score (alpha ratio + length + word-length "
    "sanity), C4/Gopher-style rules done natively.",
)
def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id", quality_score("text").alias("quality")
    )


def _lang_score_sql(markers: list[str]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return (
        "LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'), "
        f"t -> t IN ({inlist})))"
    )


_LANG_SQL_SCORES = {
    lang: _lang_score_sql(markers) for lang, markers in sorted(_LANG_MARKERS.items())
}
_LANG_BEST = "GREATEST(" + ", ".join(f"s_{lang}" for lang in _LANG_SQL_SCORES) + ")"
_LANG_CASE = (
    "CASE WHEN " + _LANG_BEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{lang} = {_LANG_BEST} THEN '{lang}'" for lang in _LANG_SQL_SCORES
    )
    + " ELSE 'und' END"
)

@register(
    "text_language_id",
    "SELECT doc_id, " + _LANG_CASE + " AS lang_pred FROM ("
    "SELECT doc_id, "
    + ", ".join(f"{sql} AS s_{lang}" for lang, sql in _LANG_SQL_SCORES.items())
    + " FROM documents)",
    doc="stopword-overlap language heuristic; ties break by language-"
    "code order.",
)
def text_language_id(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id", language_id("text").alias("lang_pred")
    )


@register(
    "text_stopword_ratio",
    "SELECT doc_id, ROUND(LEN(LIST_FILTER("
    "STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'), "
    "t -> t IN ('the', 'and', 'of', 'to', 'in'))) * 1.0 / "
    "GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')), 1), 6) "
    "AS stopword_ratio FROM documents",
    doc="stopword-density signal (C4/Gopher-style: too-low ratio "
    "flags non-prose) using the 'en' marker lexicon.",
)
def text_stopword_ratio(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    hits = F.size(
        F.filter(toks, lambda t: t.isin("the", "and", "of", "to", "in"))
    )
    total = F.greatest(F.size(F.split(F.trim(F.col("text")), r"\s+")), F.lit(1))
    return _t(spark, sf, "documents").select(
        "doc_id", F.round(hits / total, 6).alias("stopword_ratio")
    )


@register(
    "text_repetition_ratio",
    "SELECT doc_id, ROUND(1.0 - LEN(LIST_DISTINCT("
    "STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'))) * 1.0 / "
    "GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')), 1), 6) "
    "AS repetition FROM documents",
    doc="repetition signal: 1 - distinct/total token ratio (Gopher's "
    "duplicate-fraction family) — high values flag boilerplate/spam.",
)
def text_repetition_ratio(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    rep = 1.0 - F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    )
    return _t(spark, sf, "documents").select(
        "doc_id", F.round(rep, 6).alias("repetition")
    )


@register(
    "text_fingerprint",
    "SELECT doc_id, MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), "
    "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fingerprint "
    "FROM documents",
    doc="document fingerprint = md5(normalized text); the exact-dedup key.",
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id", doc_fingerprint("text").alias("fingerprint")
    )
