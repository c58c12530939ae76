"""Station-coordinates dimension source + cleanser (SURVEY.md §2.1 S6,
§2.2 O5–O6).

Reference (src/data_load_sqlite.py:115–124): load 3-col CSV, drop
embedded duplicate header rows (``lower(station_name)=='station_name'``),
coerce lat/lon to numeric with invalid → null.

~477 rows — this dimension is the canonical broadcast-join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.schemas import STATIONS_RAW_SCHEMA


def read_stations(spark: SparkSession, path: str) -> DataFrame:
    """Scan + cleanse the stations dimension."""
    raw = (
        spark.read.schema(STATIONS_RAW_SCHEMA)
        .option("header", True)
        .option("encoding", "UTF-8")
        .csv(path)
    )
    return clean_stations(raw)


def clean_stations(raw: DataFrame) -> DataFrame:
    """O5 embedded-header filter + O6 numeric coercion.

    ``cast('double')`` yields null on non-numeric input — pandas
    ``to_numeric(errors='coerce')`` parity
    (reference: src/data_load_sqlite.py:121–124).
    """
    return raw.filter(
        F.lower(F.col("station_name")) != "station_name"
    ).select(
        F.col("station_name"),
        F.col("lat").cast("double").alias("lat"),
        F.col("lon").cast("double").alias("lon"),
    )
