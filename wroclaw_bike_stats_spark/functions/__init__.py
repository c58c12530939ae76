from wroclaw_bike_stats_spark.functions.distance import (
    geodesic_km_pandas_udf,
    haversine_km,
)
from wroclaw_bike_stats_spark.functions.cleaning import clean_station

__all__ = ["haversine_km", "geodesic_km_pandas_udf", "clean_station"]
