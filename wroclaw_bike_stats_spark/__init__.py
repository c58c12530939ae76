"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo ``wojciechkarcz/wroclaw-bike-stats``.

The reference is a pandas + SQLite batch ETL pipeline for the Wrocław
city-bike system; this package re-expresses every operator it supports
(SURVEY.md §2) as idiomatic Spark DataFrame / SQL plans, designed for
multi-executor scale:

- ``sources``   — CSV/JSON readers with declared schemas (no inference).
- ``operators`` — transforms: ride cleanup+enrichment, idempotent upsert,
  snapshot diff, dedup (exact/MinHash/SimHash/ngram/embedding),
  similarity search, text analysis, multimodal column plumbing.
- ``functions`` — scalar column expressions (haversine distance,
  string cleanup) kept JVM-side for whole-stage codegen.
- ``plans``     — query layer: daily metrics (one-pass all-days),
  range/serving aggregations.
- ``streaming`` — Structured Streaming form of the snapshot-diff track.
"""

__version__ = "0.1.0"
