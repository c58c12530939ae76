"""String-cleanup column expressions (SURVEY.md §2.2 O3, §2.8 F7).

Reference semantics (src/data_load_sqlite.py:125–130): on both station
columns, remove non-breaking spaces anywhere, strip trailing
whitespace, and map the literal string ``'nan'`` back to null.
All native expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NBSP = " "


def clean_station(col: Column) -> Column:
    """Remove NBSP anywhere, rstrip, 'nan' → null.

    Order matters and mirrors the reference: NBSP removal happens
    before the rstrip (so a trailing ``"x\\xa0 "`` fully strips), and
    the 'nan' check runs on the cleaned value.
    """
    # rtrim() only strips 0x20; pandas str.rstrip() strips all trailing
    # whitespace — use a regex to match the reference exactly.
    cleaned = F.regexp_replace(F.regexp_replace(col, NBSP, ""), r"\s+$", "")
    return F.nullif(cleaned, F.lit("nan"))
