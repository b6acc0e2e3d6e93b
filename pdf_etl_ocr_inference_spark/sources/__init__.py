from pdf_etl_ocr_inference_spark.sources.catalog import (
    TABLES,
    load_table,
    register_all,
)
from pdf_etl_ocr_inference_spark.sources.readers import (
    read_binary_dir,
    read_csv,
    read_json_lines,
    read_parquet,
)
from pdf_etl_ocr_inference_spark.sources.writers import (
    overwrite_parquet,
    overwrite_table,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_all",
    "read_binary_dir",
    "read_csv",
    "read_json_lines",
    "read_parquet",
    "overwrite_parquet",
    "overwrite_table",
]
