"""Ride ingest transform (SURVEY.md §2.2 O1–O9, §2.3 J1–J2, §2.8 F4).

Reference pipeline (src/data_load_sqlite.py:114–187), re-expressed as
ONE lazy DataFrame DAG instead of eight materialized pandas steps:

    string cleanup → junk filter → 2 broadcast left joins (stations)
    → rename/project → type coercions → native haversine distance
    → fixed 12-column projection

Physical plan notes (the 100 TB story):
- The stations dimension (~477 rows) is explicitly ``broadcast()`` —
  both joins are broadcast-hash, zero shuffle of the fact side.
- Distance is a native column expression (functions.distance) — stays
  inside whole-stage codegen; the reference's row-wise ``df.apply``
  UDF (its biggest ingest cost) has no Python equivalent here at all.
- Everything is narrow (filter/project/broadcast-join): the whole
  transform is a single stage over the scan, scaling linearly with
  input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.functions.cleaning import clean_station
from wroclaw_bike_stats_spark.functions.distance import haversine_km
from wroclaw_bike_stats_spark.schemas import RAW_RENAME_MAP, RIDES_COLUMNS

# Timestamp format of the raw CSVs (FIXTURES.md §1).
_TS_FORMAT = "yyyy-MM-dd HH:mm:ss"


def transform_rides(raw: DataFrame, stations: DataFrame) -> DataFrame:
    """Clean + enrich raw rides; 12-column contract of RIDES_SCHEMA.

    ``raw`` has the Polish-headered RAW_RIDES_SCHEMA; ``stations`` the
    cleaned STATIONS_SCHEMA. Mirrors reference ``transform_data``
    (src/data_load_sqlite.py:114–187) semantically.
    """
    start_raw, end_raw = "Stacja wynajmu", "Stacja zwrotu"

    # O3: NBSP strip / rstrip / 'nan'→null on both station columns.
    df = raw.withColumn(start_raw, clean_station(F.col(start_raw))).withColumn(
        end_raw, clean_station(F.col(end_raw))
    )

    # O4: drop rows where either station starts with '#' (null-safe:
    # the reference's na=False means a null station never matches).
    junk = F.coalesce(F.col(start_raw).startswith("#"), F.lit(False)) | F.coalesce(
        F.col(end_raw).startswith("#"), F.lit(False)
    )
    df = df.filter(~junk)

    # J1/J2: two broadcast left joins against the stations dim.
    st = F.broadcast(
        stations.select(
            F.col("station_name").alias("_start_name"),
            F.col("lat").alias("lat_start"),
            F.col("lon").alias("lon_start"),
        )
    )
    en = F.broadcast(
        stations.select(
            F.col("station_name").alias("_end_name"),
            F.col("lat").alias("lat_end"),
            F.col("lon").alias("lon_end"),
        )
    )
    df = df.join(st, df[start_raw] == st["_start_name"], "left").drop("_start_name")
    df = df.join(en, df[end_raw] == en["_end_name"], "left").drop("_end_name")

    # O1: PL→EN rename.
    for src, dst in RAW_RENAME_MAP.items():
        df = df.withColumnRenamed(src, dst)

    # O7: timestamp coercion, invalid → null (errors='coerce' parity —
    # try_to_timestamp returns null instead of raising on bad input).
    # O8: nullable long coercion for uid/duration (already long from the
    # declared schema, but kept as explicit casts for schema drift).
    # O9: coord columns guaranteed double.
    df = (
        df.withColumn("start_time", F.try_to_timestamp("start_time", F.lit(_TS_FORMAT)))
        .withColumn("end_time", F.try_to_timestamp("end_time", F.lit(_TS_FORMAT)))
        .withColumn("uid", F.col("uid").cast("long"))
        .withColumn("duration", F.col("duration").cast("long"))
        .withColumn("lat_start", F.col("lat_start").cast("double"))
        .withColumn("lon_start", F.col("lon_start").cast("double"))
        .withColumn("lat_end", F.col("lat_end").cast("double"))
        .withColumn("lon_end", F.col("lon_end").cast("double"))
    )

    # F4: geodesic distance km, 3 dp, null on any null coord — native
    # haversine (within the reference's own 0.01 km test tolerance).
    df = df.withColumn(
        "distance",
        haversine_km(
            F.col("lat_start"), F.col("lon_start"), F.col("lat_end"), F.col("lon_end")
        ),
    )

    # O2: fixed 12-column projection.
    return df.select(*RIDES_COLUMNS)
