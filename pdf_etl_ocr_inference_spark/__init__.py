"""PySpark-native analytics engine with the capabilities of the
reference document-ETL + inference pipeline (see SURVEY.md).

Everything here is idiomatic open-source PySpark: DataFrame / SQL /
Catalyst / Structured Streaming.  No proprietary dependencies.

Layout
------
- ``session``     : tuned SparkSession factory (AQE, Arrow, UTC).
- ``sources``     : explicit-schema readers & writers (OP-01..10).
- ``operators``   : relational / join / dedup / similarity / document
                    operators (SURVEY.md §2 inventory).
- ``functions``   : scalar text/vector function layer (OP-36..41 +
                    text-analysis extensions).
- ``streaming``   : incremental / watermarked pipelines (OP-45/46).
- ``plans``       : query catalog (OP-ID → Spark plan + DuckDB oracle).
"""

from pdf_etl_ocr_inference_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
