from wroclaw_bike_stats_spark.plans.daily_metrics import (
    compute_all_days,
    compute_daily_metrics,
    distinct_ride_dates,
    latest_ride_date,
)

__all__ = [
    "compute_daily_metrics",
    "compute_all_days",
    "distinct_ride_dates",
    "latest_ride_date",
]
