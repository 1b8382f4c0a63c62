from toyocr_spark.streaming.ingest import (  # noqa: F401
    compact_cdx,
    compact_neardup_state,
    recrawl_schedule_from_state,
    stateful_host_progress,
    stream_blocklist_extract,
    stream_cdx,
    stream_dedup,
    stream_extract,
    stream_neardup,
    stream_recrawl,
    windowed_page_counts,
)
