from etl_migrate_api_spark.streaming.pipeline import (
    contact_stream,
    windowed_event_counts_stream,
)

__all__ = ["contact_stream", "windowed_event_counts_stream"]
