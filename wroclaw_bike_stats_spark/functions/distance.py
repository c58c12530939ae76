"""Ride distance (SURVEY.md §2.8 F4).

The reference computes geodesic distance in km on the WGS-84 ellipsoid
via ``geopy.distance.geodesic`` rounded to 3 decimals, null when any
coordinate is null (reference: src/data_load_sqlite.py:100–111), applied
row-wise with ``df.apply(axis=1)`` — its single biggest ingest CPU cost.

Spark-first design: **haversine as a native column expression** — stays
inside whole-stage codegen, vectorized, zero Python in the hot path.
Haversine (spherical, R=6371.0088 km mean Earth radius) differs from
geodesic by ≤~0.5%; the reference's own regression test accepts
haversine within 0.01 km (reference: tests/test_data_load_sqlite.py:100–112),
so this is within the published contract. For bit-parity oracles a
geopy-backed Arrow-batched pandas UDF is provided behind an import
guard (geopy is not in the runtime image).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# IUGG mean Earth radius, km.
EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column, scale: int = 3
) -> Column:
    """Great-circle distance in km as a pure native expression.

    Null-propagating: any null coordinate yields null, matching the
    reference's null-on-missing-coords rule
    (reference: src/data_load_sqlite.py:103–107).
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    d = F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))
    return F.round(d, scale)


def geodesic_km_pandas_udf():
    """Arrow-batched pandas UDF wrapping geopy's WGS-84 geodesic, for
    oracle-parity runs only (reference: src/data_load_sqlite.py:109).

    Raises ImportError at call time when geopy is absent (it is not in
    this runtime image) — callers must treat haversine as the default.
    """
    try:
        from geopy.distance import geodesic  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - geopy absent in image
        raise ImportError(
            "geopy is not installed; use haversine_km (within the "
            "reference's own 0.01 km test tolerance)"
        ) from exc

    @pandas_udf(DoubleType())
    def _geodesic_km(
        lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, c, d in zip(lat1, lon1, lat2, lon2):
            if pd.isna(a) or pd.isna(b) or pd.isna(c) or pd.isna(d):
                out.append(None)
            else:
                out.append(round(geodesic((a, b), (c, d)).km, 3))
        return pd.Series(out, dtype="float64")

    return _geodesic_km
