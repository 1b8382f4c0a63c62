from toyocr_spark.streaming.ingest import (  # noqa: F401
    stream_extract,
    windowed_page_counts,
)
