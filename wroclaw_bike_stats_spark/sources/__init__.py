from wroclaw_bike_stats_spark.sources.rides_csv import read_raw_rides
from wroclaw_bike_stats_spark.sources.stations_csv import (
    clean_stations,
    read_stations,
)
from wroclaw_bike_stats_spark.sources.snapshots import (
    flatten_snapshots,
    read_snapshots,
)

__all__ = [
    "read_raw_rides",
    "read_stations",
    "clean_stations",
    "read_snapshots",
    "flatten_snapshots",
]
