"""Transform contract tests — mirrors the reference's
tests/test_data_load_sqlite.py:31–112 golden behavior."""

from __future__ import annotations

import pytest


from wroclaw_bike_stats_spark.operators.transform import transform_rides
from wroclaw_bike_stats_spark.schemas import (
    RAW_RIDES_SCHEMA,
    RIDES_COLUMNS,
    STATIONS_RAW_SCHEMA,
)
from wroclaw_bike_stats_spark.sources.stations_csv import clean_stations


def _raw(spark, rows):
    return spark.createDataFrame(rows, RAW_RIDES_SCHEMA)


def _stations(spark, rows):
    return clean_stations(spark.createDataFrame(rows, STATIONS_RAW_SCHEMA))


STATION_ROWS = [
    ("Rynek", "51.110", "17.032"),
    ("Dworzec Główny", "51.0989", "17.0366"),
    # embedded duplicate header row — must be filtered (O5) and must not
    # poison numeric coercion (O6)
    ("station_name", "lat", "lon"),
    # junk station with empty coords
    ("#TEST", None, None),
]


def test_transform_columns_and_types(spark):
    raw = _raw(
        spark,
        [
            (1, "57000", "2024-06-05 10:00:00", "2024-06-05 10:30:00", "Rynek", "Dworzec Główny", 30),
        ],
    )
    out = transform_rides(raw, _stations(spark, STATION_ROWS))
    assert out.columns == RIDES_COLUMNS
    row = out.collect()[0]
    assert row["uid"] == 1
    assert row["bike_number"] == "57000"
    assert row["start_time"].hour == 10
    assert row["duration"] == 30
    assert row["lat_start"] == pytest.approx(51.110)
    assert row["lon_end"] == pytest.approx(17.0366)
    # haversine Rynek→Dworzec ≈ 1.27 km; reference tolerance 0.01 km
    assert row["distance"] == pytest.approx(1.266, abs=0.02)


def test_junk_station_filter_and_cleanup(spark):
    raw = _raw(
        spark,
        [
            (1, "1", "2024-06-05 10:00:00", "2024-06-05 10:10:00", "#BAD", "Rynek", 10),
            (2, "2", "2024-06-05 10:00:00", "2024-06-05 10:10:00", "Rynek", "#BAD", 10),
            # NBSP + trailing space cleanup, 'nan' → null
            (3, "3", "2024-06-05 10:00:00", "2024-06-05 10:10:00", "Rynek\xa0 ", "nan", 10),
            # null stations survive the junk filter (na=False parity)
            (4, "4", "2024-06-05 10:00:00", "2024-06-05 10:10:00", None, None, 10),
        ],
    )
    out = transform_rides(raw, _stations(spark, STATION_ROWS)).orderBy("uid").collect()
    assert [r["uid"] for r in out] == [3, 4]
    assert out[0]["start_station"] == "Rynek"
    assert out[0]["end_station"] is None
    assert out[0]["lat_start"] == pytest.approx(51.110)
    # null coord on one side → null distance (F4)
    assert out[0]["distance"] is None


def test_bad_timestamp_coerces_to_null(spark):
    raw = _raw(
        spark,
        [(1, "1", "not-a-date", "2024-06-05 10:10:00", "Rynek", "Rynek", 5)],
    )
    row = transform_rides(raw, _stations(spark, STATION_ROWS)).collect()[0]
    assert row["start_time"] is None
    assert row["end_time"] is not None


def test_unknown_station_gets_null_coords(spark):
    raw = _raw(
        spark,
        [(1, "1", "2024-06-05 10:00:00", "2024-06-05 10:10:00", "Nieznana", "Rynek", 5)],
    )
    row = transform_rides(raw, _stations(spark, STATION_ROWS)).collect()[0]
    assert row["lat_start"] is None
    assert row["distance"] is None


def test_embedded_header_filtered_from_dim(spark):
    dim = _stations(spark, STATION_ROWS)
    names = [r["station_name"] for r in dim.collect()]
    assert "station_name" not in names
    assert "#TEST" in names  # junk rows stay in the dim (filter is ride-side)
