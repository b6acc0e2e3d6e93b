"""Sketch / sampling catalog: mergeable KMV distinct sketches,
exact two-phase heavy hitters, and PPS weighted sampling — the
bounded-state profiling ops a 100 TB corpus pass leans on.

All entries here are FULLY oracled: the hashes are engineered to be
engine-replayable (md5 digit folds, Knuth multiplicative id hash) and
the floating-point expressions use only IEEE basic ops or explicit
quantization, so DuckDB reproduces Spark bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.sketch import md5_u48_sql
from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t

_KMV_K = 128
_U48 = float(1 << 48)
_H_SQL = md5_u48_sql("props")
_H_USER_SQL = md5_u48_sql("user_id")


@register(
    "sketch_kmv",
    f"SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rank FROM ("
    f"SELECT DISTINCT {_H_SQL} AS h FROM events "
    f"ORDER BY h LIMIT {_KMV_K})",
    doc="KMV distinct sketch of events.props: the 128 smallest "
    "48-bit md5-fold hashes of the distinct values — bounded state "
    "(k rows) regardless of corpus size, built with one combinable "
    "distinct-shuffle + TakeOrdered (no global sort). The hash is "
    "exact integer arithmetic in both engines, so the sketch itself "
    "is oracle-checked value-for-value (operators/sketch.py; "
    "Bar-Yossef et al. 2002).",
)
def sketch_kmv(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.sketch import kmv_sketch

    from pyspark.sql import Window

    sk = kmv_sketch(_t(spark, sf, "events"), "props", _KMV_K)
    return sk.withColumn(
        "rank", F.row_number().over(Window.orderBy("h"))
    )


@register(
    "sketch_kmv_estimate",
    f"WITH sk AS (SELECT DISTINCT {_H_SQL} AS h FROM events "
    f"ORDER BY h LIMIT {_KMV_K}) "
    f"SELECT COUNT(*) AS n_hashes, "
    f"ROUND(CASE WHEN COUNT(*) < {_KMV_K} "
    f"THEN CAST(COUNT(*) AS DOUBLE) "
    f"ELSE {float(_KMV_K - 1)} / (CAST(MAX(h) AS DOUBLE) / {_U48}) "
    f"END, 2) AS est_distinct, "
    f"(SELECT COUNT(DISTINCT props) FROM events) AS n_exact FROM sk",
    doc="KMV cardinality estimate (k-1)/u_k beside the exact distinct "
    "count: the estimate uses only IEEE *, / (correctly rounded in "
    "every 754 engine) over exact integer inputs, so even the FLOAT "
    "matches DuckDB bit-for-bit — a fully-oracled approximate "
    "distinct count. Under-k sketches degrade to the exact count.",
)
def sketch_kmv_estimate(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    ev = _t(spark, sf, "events")
    sk = kmv_sketch(ev, "props", _KMV_K)
    exact = ev.select(
        F.countDistinct("props").alias("n_exact")
    )
    return kmv_estimate(sk, _KMV_K).crossJoin(exact)


@register(
    "sketch_kmv_merge",
    f"WITH sk AS (SELECT DISTINCT {_H_USER_SQL} AS h FROM events "
    f"ORDER BY h LIMIT {_KMV_K}) "
    f"SELECT COUNT(*) AS n_hashes, "
    f"ROUND(CASE WHEN COUNT(*) < {_KMV_K} "
    f"THEN CAST(COUNT(*) AS DOUBLE) "
    f"ELSE {float(_KMV_K - 1)} / (CAST(MAX(h) AS DOUBLE) / {_U48}) "
    f"END, 2) AS est_distinct FROM sk",
    doc="KMV mergeability, engine-checked: sketch the even-id and "
    "odd-id halves of events INDEPENDENTLY, merge (union + re-take "
    "k smallest), estimate — the oracle sketches the whole table in "
    "one pass. Equality is the property that lets per-day/ "
    "per-partition sketches roll up without re-scanning history.",
)
def sketch_kmv_merge(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    ev = _t(spark, sf, "events")
    a = kmv_sketch(ev.filter(F.col("event_id") % 2 == 0), "user_id", _KMV_K)
    b = kmv_sketch(ev.filter(F.col("event_id") % 2 == 1), "user_id", _KMV_K)
    merged = kmv_merge(a, b).orderBy("h").limit(_KMV_K)
    return kmv_estimate(merged, _KMV_K)


@register(
    "sketch_heavy_hitters",
    "SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id "
    "HAVING COUNT(*) >= CEIL(0.008 * (SELECT COUNT(*) FROM events))",
    doc="exact heavy hitters (keys in >= 0.8% of rows) WITHOUT "
    "shuffling the full key space: per-partition local-threshold "
    "candidate pass (mapInPandas, <= 1/eps keys per partition — any "
    "globally-heavy key clears the local bar somewhere, so "
    "candidates are a superset) + exact count of candidate rows "
    "only via broadcast semi-join. Result is exact, hence fully "
    "oracled against the naive GROUP BY it avoids at scale "
    "(operators/sketch.py).",
)
def sketch_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.sketch import heavy_hitters

    return heavy_hitters(_t(spark, sf, "events"), "user_id", 0.008)


_SAMPLE_HASH = "((doc_id * 2654435761 + 12345) % 4294967296)"


@register(
    "train_weighted_sample",
    "SELECT doc_id, lang, n_chars FROM ("
    "SELECT doc_id, lang, n_chars, "
    f"ROUND(LN(({_SAMPLE_HASH} + 1) / 4294967296.0) "
    "/ CAST(n_chars AS DOUBLE), 6) AS k "
    "FROM documents WHERE n_chars > 0) "
    "ORDER BY k DESC, doc_id LIMIT 50",
    doc="deterministic weighted sampling without replacement, "
    "inclusion probability proportional to n_chars (Efraimidis-"
    "Spirakis A-ES): rank by ln(u)/w with u the Knuth hash of "
    "doc_id, keep the top 50 via TakeOrdered (per-partition heap, "
    "no global sort). The rank key is quantized to 6 decimals with "
    "an id tie-break so the libm ln() ulp can't diverge the "
    "engines; the draw is a pure function of doc_id — reproducible "
    "and auditable in plain SQL (operators/sampling.py).",
)
def train_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.sampling import (
        weighted_sample_topn,
    )

    docs = _t(spark, sf, "documents")
    return weighted_sample_topn(docs, "doc_id", "n_chars", 50).select(
        "doc_id", "lang", "n_chars"
    )
