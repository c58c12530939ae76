from wroclaw_bike_stats_spark.operators.transform import transform_rides

__all__ = ["transform_rides"]
