from pdf_extraction_spark.streaming.jobs import (  # noqa: F401
    EVENTS_SCHEMA,
    TRANSCRIPTS_SCHEMA,
    stream_events_windowed,
    stream_extraction,
)
