from formula1_etl_analytics_project_spark.streaming.pipeline import (
    incremental_upsert_stream,
    windowed_event_counts,
)

__all__ = ["windowed_event_counts", "incremental_upsert_stream"]
