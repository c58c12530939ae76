from wroclaw_bike_stats_spark.streaming.status_stream import (  # noqa: F401
    StatusChangeStream,
    run_available_now,
)
