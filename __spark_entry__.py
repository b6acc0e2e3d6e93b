"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` are derived from the engine's query
catalog (one entry per implemented SURVEY.md §2 OP-ID, each Spark plan
paired with its DuckDB oracle SQL where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_etl_ocr_inference_spark.plans import oracle_map, query_map

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → chunk (mapInPandas, LPT layout) →
    length-filter → stub-embed (iterator pandas UDF) → cosine top-10."""
    from pdf_etl_ocr_inference_spark.plans.document_plans import (
        pipeline_chunk_embed_topk,
    )

    return pipeline_chunk_embed_topk(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_map()
