from unstract_spark.streaming.incremental import (  # noqa: F401
    incremental_file_pipeline,
    windowed_event_aggregation,
)
