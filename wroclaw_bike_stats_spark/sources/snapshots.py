"""Nextbike snapshot JSON source + flattener (SURVEY.md §2.1 S11,
§2.2 O14–O17).

The reference walks ``data[0].cities[0].places`` imperatively and emits
one dict entry per bike (reference: src/bike_status_changes.py:28–85).
Spark-first: declared nested schema → ``explode`` chain — a native UDTF
shape, fully JVM-side, parallel over snapshot files.

Semantics reproduced:
- O14: skip places with neither ``bikes`` nor ``bikeNumbers``
  (alt key ``bike_numbers`` accepted, reference :46).
- O15: ``placeType`` starting with FREESTANDING (case-insensitive) →
  station_name = station_id = 'freestanding'; else name / str(uid).
- O16: bikeType starting with ELECTRIC → 'electric' else 'standard';
  ``bikeNumbers`` is consulted **only when the place's ``bikes`` list is
  empty** (reference :59–84 ``if bikes_list: ... else:``), and such
  bikes get null type/battery.
- O17: duplicate bike_id within one snapshot → the *later place wins*
  (dict-overwrite order in the reference). Realized with a window over
  (snapshot, bike_id) ordered by place position desc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.schemas import SNAPSHOT_SCHEMA


def read_snapshots(spark: SparkSession, path: str) -> DataFrame:
    """Scan snapshot JSON files (one document per file, pretty-printed →
    multiLine)."""
    return spark.read.schema(SNAPSHOT_SCHEMA).option("multiLine", True).json(path)


def flatten_snapshots(snapshots: DataFrame) -> DataFrame:
    """Nested snapshot docs → one row per (snapshot_ts, bike_id).

    Output schema: BIKE_SNAPSHOT_SCHEMA.
    """
    # posexplode keeps the place's position so O17's "later place wins"
    # is deterministic, not dependent on row order after a shuffle.
    places = (
        snapshots.select(
            F.col("_fetched_at").alias("snapshot_ts"),
            # data: array<struct>; .cities extracts per-element →
            # array<array<city>>; flatten; .places → array<array<place>>;
            # flatten → one array of places per snapshot, in document
            # order (generalizes the reference's data[0].cities[0]).
            F.posexplode(
                F.flatten(F.flatten(F.col("data.cities")).getField("places"))
            ).alias("place_pos", "place"),
        )
        .withColumn("nbikes", F.size(F.coalesce(F.col("place.bikes"), F.array())))
        .withColumn(
            "numbers",
            F.coalesce(
                F.col("place.bikeNumbers"), F.col("place.bike_numbers"), F.array()
            ),
        )
        # O14: a place with no bikes in either representation emits nothing.
        .filter((F.col("nbikes") > 0) | (F.size("numbers") > 0))
    )

    freestanding = F.upper(F.col("place.placeType")).startswith("FREESTANDING")
    station_name = F.when(freestanding, F.lit("freestanding")).otherwise(
        F.col("place.name")
    )
    station_id = F.when(freestanding, F.lit("freestanding")).otherwise(
        F.col("place.uid").cast("string")
    )

    common = [
        F.col("snapshot_ts"),
        F.col("place_pos"),
        station_name.alias("station_name"),
        station_id.alias("station_id"),
        F.col("place.geoCoords.lat").alias("lat"),
        F.col("place.geoCoords.lng").alias("lon"),
    ]

    # Typed bikes from the `bikes` array.
    from_bikes = places.filter(F.col("nbikes") > 0).select(
        *common, F.explode("place.bikes").alias("bike")
    ).select(
        "snapshot_ts",
        "place_pos",
        F.col("bike.number").cast("string").alias("bike_id"),
        "station_name",
        "station_id",
        "lat",
        "lon",
        F.when(
            F.upper(F.col("bike.bikeType")).startswith("ELECTRIC"), F.lit("electric")
        )
        .otherwise(F.lit("standard"))
        .alias("bike_type"),
        F.col("bike.battery").alias("battery"),
    )

    # bikeNumbers-only places (bikes list empty): null type/battery.
    from_numbers = places.filter(F.col("nbikes") == 0).select(
        *common, F.explode("numbers").alias("bike_id")
    ).select(
        "snapshot_ts",
        "place_pos",
        F.col("bike_id").cast("string").alias("bike_id"),
        "station_name",
        "station_id",
        "lat",
        "lon",
        F.lit(None).cast("string").alias("bike_type"),
        F.lit(None).cast("double").alias("battery"),
    )

    unioned = from_bikes.unionByName(from_numbers)

    # O17: within one snapshot, for duplicate bike_ids the reference's
    # dict assignment means the *last write wins*: the later place beats
    # the earlier one.
    w = Window.partitionBy("snapshot_ts", "bike_id").orderBy(F.desc("place_pos"))
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "place_pos")
    )
