"""Structured Streaming form of the snapshot→event track (SURVEY.md
§2.9; reference orchestration src/pipeline.py:13–33, diff semantics
src/bike_status_changes.py:106–157).

The reference re-runs a script per minute, re-reading the latest two
snapshot files. Here the landing directory is a streaming file source
and the "previous snapshot" becomes explicit, durable per-bike state:

- **source**: ``readStream.json`` over the landing dir (one pretty-
  printed document per file, hence ``multiLine``) with the declared
  nested schema — new files are discovered incrementally via the
  checkpoint, never re-listed into the batch.
- **state**: the flattened per-bike rows of the most recently
  processed snapshot, persisted as versioned parquet (tiny: one row
  per bike in the fleet). Equivalent to the keyed last-seen state a
  ``transformWithStateInPandas`` operator would carry, but (a) the
  disappearance case needs to observe "snapshot happened, bike row
  didn't" — which per-key arbitrary-state operators only reach via
  timers — and (b) the union-with-state formulation lets streaming
  and batch share ONE diff implementation
  (``operators.snapshot_diff.diff_snapshot_series``), so the two
  paths cannot drift.
- **processing**: each micro-batch unions the carried state rows with
  the batch's flattened snapshots and runs the series diff — emitting
  exactly the events of every consecutive pair, including the bridge
  pair (state, first-new-snapshot).
- **sink**: append-only parquet event log; at-least-once, matching
  the reference's re-run-appends-duplicates contract (reference
  src/bike_status_changes.py:188–209). Exactly-once would need an
  idempotent/transactional sink (e.g. Delta MERGE on a dedup key).
- **trigger**: ``Trigger.AvailableNow`` for cron parity (drain the
  landing dir, then stop); drop the trigger for continuous tailing.

Scale: state size is O(fleet), events are O(changes); each batch does
one broadcast join against the snapshot index and one shuffle keyed by
bike_id — no dense grid, no cross join (see diff_snapshot_series).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators.snapshot_diff import diff_snapshot_series
from wroclaw_bike_stats_spark.schemas import SNAPSHOT_SCHEMA
from wroclaw_bike_stats_spark.sources.snapshots import flatten_snapshots

_STATE_PREFIX = "v"


class StatusChangeStream:
    """Streaming snapshot differ with durable per-bike last-seen state.

    Parameters
    ----------
    landing_dir : directory the fetcher drops snapshot JSONs into.
    events_dir  : append-only parquet event log (output).
    state_dir   : versioned per-bike state (internal).
    checkpoint_dir : Structured Streaming checkpoint location.
    """

    def __init__(
        self,
        spark: SparkSession,
        landing_dir: str,
        events_dir: str,
        state_dir: str,
        checkpoint_dir: str,
    ) -> None:
        self.spark = spark
        self.landing_dir = landing_dir
        self.events_dir = events_dir
        self.state_dir = state_dir
        self.checkpoint_dir = checkpoint_dir

    # -- state ------------------------------------------------------------

    def _state_versions(self) -> list[int]:
        if not os.path.isdir(self.state_dir):
            return []
        out = []
        for name in os.listdir(self.state_dir):
            if name.startswith(_STATE_PREFIX):
                try:
                    out.append(int(name[len(_STATE_PREFIX):]))
                except ValueError:
                    continue
        return sorted(out)

    def _read_state(self) -> DataFrame | None:
        versions = self._state_versions()
        if not versions:
            return None
        path = os.path.join(self.state_dir, f"{_STATE_PREFIX}{versions[-1]}")
        return self.spark.read.parquet(path)

    def _write_state(self, flat: DataFrame, batch_id: int) -> None:
        # Versioned dirs: never overwrite the path a lazy plan may
        # still read from; _prune_state drops stale versions after the
        # batch's write lands.
        path = os.path.join(self.state_dir, f"{_STATE_PREFIX}{batch_id}")
        flat.write.mode("overwrite").parquet(path)

    def _prune_state(self, keep: int = 2) -> None:
        # Keep the newest version plus its predecessor (crash safety:
        # the predecessor is what a retried batch would re-read) and
        # delete the rest, bounding state storage on long-running
        # streams to O(fleet) instead of O(fleet × batches).
        import shutil

        for v in self._state_versions()[:-keep]:
            shutil.rmtree(
                os.path.join(self.state_dir, f"{_STATE_PREFIX}{v}"),
                ignore_errors=True,
            )

    # -- batch processing --------------------------------------------------

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        flat = flatten_snapshots(batch_df)
        if flat.isEmpty():
            return
        state = self._read_state()
        combined = state.unionByName(flat) if state is not None else flat

        events = diff_snapshot_series(combined)
        events.write.mode("append").parquet(self.events_dir)

        # New state = the rows of the newest snapshot in this batch.
        latest_ts = combined.agg(F.max("snapshot_ts")).collect()[0][0]
        self._write_state(
            combined.filter(F.col("snapshot_ts") == latest_ts), batch_id
        )
        self._prune_state()

    # -- driver ------------------------------------------------------------

    def start(self, available_now: bool = True):
        stream = (
            self.spark.readStream.schema(SNAPSHOT_SCHEMA)
            .option("multiLine", True)
            # process snapshot files oldest-first so consecutive-pair
            # semantics hold across batches
            .option("latestFirst", False)
            .option("maxFilesPerTrigger", 1)
            .json(self.landing_dir)
        )
        writer = stream.writeStream.foreachBatch(self._process_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def events(self) -> DataFrame:
        return self.spark.read.parquet(self.events_dir)


def run_available_now(
    spark: SparkSession,
    landing_dir: str,
    events_dir: str,
    state_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Drain the landing dir once (cron parity) and return the event
    log. Re-invocations process only files the checkpoint hasn't seen."""
    s = StatusChangeStream(spark, landing_dir, events_dir, state_dir, checkpoint_dir)
    q = s.start(available_now=True)
    q.awaitTermination()
    return s.events()
