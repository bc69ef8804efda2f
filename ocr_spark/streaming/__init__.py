from ocr_spark.streaming.jobs import (  # noqa: F401
    dedup_within_watermark,
    events_stream,
    rate_limited_events,
    run_available_now,
    session_agg,
    sliding_counts,
    stream_extract,
    tumbling_counts,
)
