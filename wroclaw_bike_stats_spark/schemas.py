"""Declared schemas for every table the engine touches (SURVEY.md §1.2).

The reference infers dtypes at ingest (pandas ``read_csv`` with no dtype
spec, reference: src/data_load_sqlite.py:266) but declares them at rest
(SQLite DDL, reference: src/data_load_sqlite.py:194–211). Here every
production path uses a declared ``StructType`` — inference is reserved
for ad-hoc exploration only.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Raw daily rides CSV — Polish headers, as published by the open-data portal.
# Reference header: data/sample/Historia_przejazdow_2024-6-5_22_18_5.csv:1
# Timestamps stay strings here; coercion-with-null-on-bad-value happens in
# the transform (errors='coerce' parity, reference: src/data_load_sqlite.py:162–169).
RAW_RIDES_SCHEMA = StructType(
    [
        StructField("UID wynajmu", LongType()),
        StructField("Numer roweru", StringType()),
        StructField("Data wynajmu", StringType()),
        StructField("Data zwrotu", StringType()),
        StructField("Stacja wynajmu", StringType()),
        StructField("Stacja zwrotu", StringType()),
        StructField("Czas trwania", LongType()),
    ]
)

# Polish → English rename map (reference: src/data_load_sqlite.py:146–159).
RAW_RENAME_MAP = {
    "UID wynajmu": "uid",
    "Numer roweru": "bike_number",
    "Data wynajmu": "start_time",
    "Data zwrotu": "end_time",
    "Stacja wynajmu": "start_station",
    "Stacja zwrotu": "end_station",
    "Czas trwania": "duration",
}

# ---------------------------------------------------------------------------
# Station coordinates dimension (~477 rows).
# lat/lon arrive as strings in the wild (embedded duplicate header rows);
# read as string and coerce in the cleanser (reference: src/data_load_sqlite.py:115–124).
STATIONS_RAW_SCHEMA = StructType(
    [
        StructField("station_name", StringType()),
        StructField("lat", StringType()),
        StructField("lon", StringType()),
    ]
)

STATIONS_SCHEMA = StructType(
    [
        StructField("station_name", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Cleaned fact table (reference DDL: src/data_load_sqlite.py:194–211).
# 12 canonical columns in fixed order (reference: src/data_load_sqlite.py:181–187).
RIDES_COLUMNS = [
    "uid",
    "bike_number",
    "start_time",
    "end_time",
    "start_station",
    "end_station",
    "duration",
    "lat_start",
    "lon_start",
    "lat_end",
    "lon_end",
    "distance",
]

RIDES_SCHEMA = StructType(
    [
        StructField("uid", LongType()),
        StructField("bike_number", StringType()),
        StructField("start_time", TimestampType()),
        StructField("end_time", TimestampType()),
        StructField("start_station", StringType()),
        StructField("end_station", StringType()),
        StructField("duration", LongType()),
        StructField("lat_start", DoubleType()),
        StructField("lon_start", DoubleType()),
        StructField("lat_end", DoubleType()),
        StructField("lon_end", DoubleType()),
        StructField("distance", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Nextbike snapshot document (reference parse: src/bike_status_changes.py:37–85;
# shape: data/sample/snapA.json). Declared nested schema → spark.read.json
# never infers in production.
SNAPSHOT_SCHEMA = StructType(
    [
        StructField("_fetched_at", StringType()),
        StructField(
            "data",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "cities",
                            ArrayType(
                                StructType(
                                    [
                                        StructField(
                                            "places",
                                            ArrayType(
                                                StructType(
                                                    [
                                                        StructField("uid", StringType()),
                                                        StructField("name", StringType()),
                                                        StructField("placeType", StringType()),
                                                        StructField(
                                                            "geoCoords",
                                                            StructType(
                                                                [
                                                                    StructField("lat", DoubleType()),
                                                                    StructField("lng", DoubleType()),
                                                                ]
                                                            ),
                                                        ),
                                                        StructField(
                                                            "bikes",
                                                            ArrayType(
                                                                StructType(
                                                                    [
                                                                        StructField("number", StringType()),
                                                                        StructField("bikeType", StringType()),
                                                                        StructField("battery", DoubleType()),
                                                                    ]
                                                                )
                                                            ),
                                                        ),
                                                        StructField(
                                                            "bikeNumbers", ArrayType(StringType())
                                                        ),
                                                        # Alt key accepted by the reference
                                                        # (src/bike_status_changes.py:46).
                                                        StructField(
                                                            "bike_numbers", ArrayType(StringType())
                                                        ),
                                                    ]
                                                )
                                            ),
                                        )
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        ),
    ]
)

# Flattened per-bike snapshot row (output of sources.snapshots.flatten_snapshots).
BIKE_SNAPSHOT_SCHEMA = StructType(
    [
        StructField("snapshot_ts", StringType()),
        StructField("bike_id", StringType()),
        StructField("station_name", StringType()),
        StructField("station_id", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("bike_type", StringType()),
        StructField("battery", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Derived event log (reference DDL: src/bike_status_changes.py:173–187).
# `timestamp` is an ISO string at rest, matching the reference.
STATUS_EVENT_SCHEMA = StructType(
    [
        StructField("timestamp", StringType()),
        StructField("bike_id", StringType()),
        StructField("event_type", StringType()),
        StructField("station_name", StringType()),
        StructField("station_id", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("bike_type", StringType()),
        StructField("battery", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Per-day metrics row (reference shape: src/compute_daily_metrics.py:182–194).
DAILY_METRICS_SCHEMA = StructType(
    [
        StructField("ride_date", StringType()),
        StructField("total_rides", LongType()),
        StructField("bike_rentals_histogram", MapType(StringType(), LongType())),
        StructField("avg_distance_km", DoubleType()),
        StructField("avg_duration_min", DoubleType()),
        StructField("total_distance_km", DoubleType()),
        StructField("total_duration_min", LongType()),
        StructField("round_trips", LongType()),
        StructField("left_outside_station", LongType()),
        StructField(
            "busiest_stations_top5",
            ArrayType(
                StructType(
                    [
                        StructField("station", StringType()),
                        StructField("arrivals", LongType()),
                        StructField("departures", LongType()),
                        StructField("total", LongType()),
                    ]
                )
            ),
        ),
        StructField(
            "top_routes_top5",
            ArrayType(
                StructType(
                    [
                        StructField("start_station", StringType()),
                        StructField("end_station", StringType()),
                        StructField("rides", LongType()),
                    ]
                )
            ),
        ),
    ]
)

# Sentinel station values (reference: src/compute_daily_metrics.py:107,119,124,165).
OUTSIDE_STATION = "Poza stacją"
