from pdf_etl_ocr_inference_spark.operators.joins import (
    key_join,
    positional_join,
    zip_with_index,
)

__all__ = ["key_join", "positional_join", "zip_with_index"]
