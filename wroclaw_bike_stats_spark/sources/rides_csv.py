"""Raw daily rides CSV source (SURVEY.md §2.1 S5).

The reference does ``pd.read_csv(raw_path, encoding='utf-8')`` with
inferred dtypes (reference: src/data_load_sqlite.py:266). Here the
schema is declared (FIXTURES.md §1): Polish headers, timestamps read as
*strings* so that invalid values can be coerced to null in the
transform (``errors='coerce'`` parity) instead of failing the scan.

Scale note: one file per day in the reference; at 100 TB this is a
directory-of-days — pass a glob and Spark parallelizes the scan; the
declared schema avoids an inference pre-pass over the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wroclaw_bike_stats_spark.schemas import RAW_RIDES_SCHEMA


def read_raw_rides(spark: SparkSession, path: str) -> DataFrame:
    """Scan one daily CSV (or a glob/directory of them)."""
    return (
        spark.read.schema(RAW_RIDES_SCHEMA)
        .option("header", True)
        .option("encoding", "UTF-8")
        # PERMISSIVE: malformed fields → null, matching pandas
        # errors='coerce' downstream behavior rather than aborting.
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
