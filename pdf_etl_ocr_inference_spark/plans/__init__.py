from pdf_etl_ocr_inference_spark.plans.registry import (
    QuerySpec,
    all_specs,
    oracle_map,
    query_map,
)

__all__ = ["QuerySpec", "all_specs", "oracle_map", "query_map"]
