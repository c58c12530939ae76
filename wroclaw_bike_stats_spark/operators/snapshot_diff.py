"""Snapshot diff → arrival/departure events (SURVEY.md §2.3 J4, §2.9).

Reference semantics (src/bike_status_changes.py:106–157), keyed by
``bike_id`` between a previous and current snapshot:

- prev-only                          → ``departed`` (prev info)
- curr-only                          → ``arrived`` (curr info)
- in both, ``station_id`` changed    → ``departed`` (prev info)
                                       AND ``arrived`` (curr info)
- in both, unchanged                 → no event

All events are stamped with the **current** snapshot's timestamp.

Two Spark formulations:

1. ``diff_snapshot_pair`` — FULL OUTER join on bike_id, the direct
   analog of the reference's dict walk (anti-join semantics fall out of
   the null sides of the outer join).

2. ``diff_snapshot_series`` — the N-snapshot generalization: one
   ``lag()`` window per bike over the whole snapshot history, emitting
   the same events for EVERY consecutive pair in one pass. On the
   latest pair it is event-for-event identical to the reference; at
   scale it turns "re-run the script per minute" into a single job
   over a day/month of snapshots (shuffle once on bike_id, then
   narrow). The streaming form (streaming/status_stream.py) carries
   the same state keyed by bike_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INFO_COLS = ["station_name", "station_id", "lat", "lon", "bike_type", "battery"]


def diff_snapshot_pair(prev: DataFrame, curr: DataFrame, timestamp: str) -> DataFrame:
    """Events between exactly two flattened snapshots
    (BIKE_SNAPSHOT_SCHEMA rows, one row per bike each)."""
    p = prev.select(
        F.col("bike_id"),
        F.lit(True).alias("p_present"),
        *[F.col(c).alias(f"p_{c}") for c in _INFO_COLS],
    )
    c = curr.select(
        F.col("bike_id"),
        F.lit(True).alias("c_present"),
        *[F.col(c).alias(f"c_{c}") for c in _INFO_COLS],
    )
    joined = p.join(c, "bike_id", "full_outer")

    # Presence = the join side existed, NOT station_id non-nullness:
    # flatten_snapshots can emit a present bike with null station_id
    # (non-freestanding place with null uid), which must not read as
    # absence. `moved` is null-safe for the same reason, so the pair
    # and series formulations agree on such rows.
    in_prev = F.col("p_present").isNotNull()
    in_curr = F.col("c_present").isNotNull()
    moved = (
        in_prev
        & in_curr
        & ~F.col("p_station_id").eqNullSafe(F.col("c_station_id"))
    )

    def _event(kind: str, prefix: str):
        return F.struct(
            F.lit(kind).alias("event_type"),
            *[F.col(f"{prefix}_{c}").alias(c) for c in _INFO_COLS],
        )

    events = joined.select(
        "bike_id",
        F.filter(
            F.array(
                F.when(~in_curr | moved, _event("departed", "p")),
                F.when(~in_prev | moved, _event("arrived", "c")),
            ),
            lambda x: x.isNotNull(),
        ).alias("evs"),
    ).select("bike_id", F.explode("evs").alias("ev"))

    return events.select(
        F.lit(timestamp).alias("timestamp"),
        "bike_id",
        F.col("ev.event_type").alias("event_type"),
        *[F.col(f"ev.{c}").alias(c) for c in _INFO_COLS],
    )


def diff_snapshot_series(bike_snapshots: DataFrame) -> DataFrame:
    """Events for every consecutive snapshot pair in one windowed pass.

    ``bike_snapshots`` is the flattened per-bike table across N
    snapshots (sources.snapshots.flatten_snapshots over a directory).

    Sparse formulation — no dense bike×snapshot grid, no cross join:

    1. Index the distinct snapshot timestamps 0..max (one row per
       snapshot file — tiny, broadcast everywhere).
    2. One window per bike over its OBSERVED rows only, carrying
       lag(snap_idx)/lead(snap_idx) plus the lagged station info.
    3. Absence is detected by index arithmetic, not by null grid rows:
       - arrived  @ this row's ts: first-ever observation after the
         series start, reappearance after a gap (prev_idx < idx-1),
         or a consecutive move (station changed).
       - departed @ snapshot[idx+1].ts with THIS row's info: the bike
         is absent from the next snapshot (next_idx > idx+1, or no
         next observation while idx < max) — the reference stamps a
         disappearance with the *current* (post-gap) snapshot's ts.
       - departed @ this row's ts with the LAGGED info: consecutive
         move.

    Cost: one shuffle on bike_id for the window + two broadcast joins
    against the snapshot index. Work is O(|observations|), which is
    ≤ the dense grid's |bikes|×|snapshots| by exactly the absence
    sparsity — at 100× snapshot retention the grid dominated; this
    doesn't. The streaming form (streaming/status_stream.py) carries
    the same per-bike last-seen state incrementally.
    """
    # Snapshot index: tiny (one row per snapshot); the single-partition
    # windows below only ever run on this table, never on bike rows.
    w_all = Window.partitionBy(F.lit(1))
    w_ord = w_all.orderBy("snapshot_ts")
    snap_idx = (
        bike_snapshots.select("snapshot_ts")
        .distinct()
        .select(
            "snapshot_ts",
            (F.row_number().over(w_ord) - 1).alias("snap_idx"),
        )
        .withColumn("max_idx", F.max("snap_idx").over(w_all))
    )

    obs = bike_snapshots.join(F.broadcast(snap_idx), "snapshot_ts")
    w = Window.partitionBy("bike_id").orderBy("snap_idx")
    seq = obs.select(
        "bike_id",
        "snapshot_ts",
        "snap_idx",
        "max_idx",
        *_INFO_COLS,
        F.lag("snap_idx").over(w).alias("p_idx"),
        F.lead("snap_idx").over(w).alias("n_idx"),
        *[F.lag(c).over(w).alias(f"p_{c}") for c in _INFO_COLS],
    )

    consecutive = F.col("p_idx") == F.col("snap_idx") - 1
    # null-safe: a move involving a null station_id still counts
    # (matches diff_snapshot_pair's null-safe `moved`)
    moved = consecutive & ~F.col("p_station_id").eqNullSafe(F.col("station_id"))
    appeared = (
        (F.col("p_idx").isNull() & (F.col("snap_idx") > 0))
        | (F.col("p_idx") < F.col("snap_idx") - 1)
    )
    absent_next = (
        F.col("n_idx").isNull() & (F.col("snap_idx") < F.col("max_idx"))
    ) | (F.col("n_idx") > F.col("snap_idx") + 1)

    # Disappearance events are stamped with the ts of the snapshot the
    # bike went missing from — left-join (snap_idx + 1) back to the
    # index up front so all three event kinds emit from ONE pass.
    next_ts = snap_idx.select(
        F.col("snap_idx").alias("_next_idx"), F.col("snapshot_ts").alias("_next_ts")
    )
    seq = seq.withColumn("_next_idx", F.col("snap_idx") + 1).join(
        F.broadcast(next_ts), "_next_idx", "left"
    )

    # Single-pass emission, same array-of-structs + explode pattern as
    # diff_snapshot_pair: one scan, one window, no union. (The earlier
    # three-branch union re-scanned the nested-JSON flatten per branch
    # and tripped Spark's nested-schema pruning when a consumer
    # filtered the result — INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on the
    # _extract_* aliases; single-scan emission is both the faster plan
    # and immune to that rewrite.)
    def ev(ts_col, kind, cols):
        return F.struct(
            ts_col.alias("timestamp"),
            F.lit(kind).alias("event_type"),
            *[F.col(c).alias(a) for c, a in cols],
        )

    own = [(c, c) for c in _INFO_COLS]
    lagged = [(f"p_{c}", c) for c in _INFO_COLS]
    evs = F.filter(
        F.array(
            F.when(moved, ev(F.col("snapshot_ts"), "departed", lagged)),
            F.when(absent_next, ev(F.col("_next_ts"), "departed", own)),
            F.when(appeared | moved, ev(F.col("snapshot_ts"), "arrived", own)),
        ),
        lambda x: x.isNotNull(),
    )
    events = seq.select("bike_id", F.explode(evs).alias("ev"))
    return events.select(
        F.col("ev.timestamp").alias("timestamp"),
        "bike_id",
        F.col("ev.event_type").alias("event_type"),
        *[F.col(f"ev.{c}").alias(c) for c in _INFO_COLS],
    )
