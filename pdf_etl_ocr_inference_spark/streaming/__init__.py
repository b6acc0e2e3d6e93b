from pdf_etl_ocr_inference_spark.streaming.incremental import (
    run_available_now,
    stream_events_tumbling,
)

__all__ = ["run_available_now", "stream_events_tumbling"]
