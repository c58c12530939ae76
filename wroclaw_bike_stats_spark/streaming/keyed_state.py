"""Arbitrary keyed state in Structured Streaming:
``applyInPandasWithState`` form of the per-key change detector
(SURVEY.md §2.9 / §2.10 — the custom-stateful-operator pattern the
built-in windowed aggs can't express).

The batch engine detects status changes with a ``lag()`` window
(``q_status_change_events``): emit a row when a key's value differs
from its previous one. Streaming can't lag across micro-batches
without state — here each key carries its last-seen (ts, value) as
explicit GroupState, so a change that straddles a batch boundary is
still detected, without re-reading history.

Contrast with ``status_stream.py``: the snapshot differ keeps its
state as a union-able DataFrame because its disappearance semantics
need "snapshot happened, key absent" visibility. This operator's
semantics are purely per-key, which is exactly what
``applyInPandasWithState`` models — Arrow-batched pandas per key
group, state read/write on the JVM state store, no driver
involvement.

Ordering contract: rows WITHIN a micro-batch are sorted by (ts,
event_id) per key before diffing; ACROSS batches the operator trusts
arrival order (state holds whatever was last processed), the same
cadence assumption the reference's minute-tick pipeline makes
(reference src/pipeline.py:13-33). Files must land oldest-first —
guaranteed here by ``latestFirst=false`` + ``maxFilesPerTrigger=1``.

Scale: state is O(distinct keys) × a few scalar columns, partitioned
by key across executors by the state store; each micro-batch shuffles
only its own rows on the key. This is the standard pattern for
billion-key fleets — no global windows, no cross-batch reprocessing.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CHANGE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
        StructField("prev_type", StringType()),
        StructField("curr_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)

# state: last seen (epoch micros, event_type) per key — scalars only,
# so the state store rows stay tiny.
STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _detect_changes(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    prev_us, prev_type = state.get if state.exists else (None, None)

    frames = [b for b in batches if len(b)]
    if not frames:  # only reachable via timeouts (not configured here)
        yield pd.DataFrame(columns=[f.name for f in CHANGE_SCHEMA.fields])
        return
    rows = pd.concat(frames, ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")

    out = []
    for r in rows.itertuples(index=False):
        curr = r.event_type
        if prev_type is not None and curr != prev_type:
            out.append((r.event_id, user_id, prev_type, curr, r.ts))
        prev_type = curr
        prev_us = int(pd.Timestamp(r.ts).value // 1000)
    state.update((prev_us, prev_type))
    yield pd.DataFrame(out, columns=[f.name for f in CHANGE_SCHEMA.fields])


INACTIVITY_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("last_seen", TimestampType()),
        StructField("inactive_at", TimestampType()),
    ]
)

INACTIVITY_STATE_SCHEMA = StructType([StructField("last_us", LongType())])


def _make_inactivity_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def _detect(key, batches, state: GroupState):
        (user_id,) = key
        cols = [f.name for f in INACTIVITY_SCHEMA.fields]
        if state.hasTimedOut:
            # Timer fired: the watermark passed last_seen + gap with no
            # new data for this key → emit the inactivity event and
            # drop the state (a later event simply starts a new run).
            (last_us,) = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    (
                        user_id,
                        pd.Timestamp(last_us, unit="us"),
                        pd.Timestamp(last_us + gap_us, unit="us"),
                    )
                ],
                columns=cols,
            )
            return
        frames = [b for b in batches if len(b)]
        last_us = state.get[0] if state.exists else None
        for f in frames:
            m = int(pd.Timestamp(f["ts"].max()).value // 1000)
            last_us = m if last_us is None else max(last_us, m)
        state.update((last_us,))
        # Timeout must be strictly beyond the current watermark or
        # Spark rejects it; a key already overdue times out at the
        # next watermark tick instead of silently never.
        timeout_ms = max(
            (last_us + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame([], columns=cols)

    return _detect


def stream_inactivity(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    sink_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit (user_id, last_seen, inactive_at) when a key goes quiet
    for ``gap_seconds`` of EVENT time — the timer-based form of
    disappearance detection (``GroupStateTimeout.EventTimeTimeout``):
    absence can't be observed in arriving rows, only a timer firing
    when the watermark passes last_seen + gap can see it. This is the
    per-key-operator answer to the snapshot differ's disappearance
    case (see status_stream.py's module docstring)."""
    src = (
        spark.readStream.schema(schema)
        .option("latestFirst", False)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    out = src.groupBy("user_id").applyInPandasWithState(
        _make_inactivity_fn(gap_seconds),
        outputStructType=INACTIVITY_SCHEMA,
        stateStructType=INACTIVITY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink_dir)


def stream_status_changes(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    sink_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Drain ``source_dir`` (parquet files of events) through the
    keyed-state change detector into an append-only parquet sink;
    return the sink contents."""
    src = (
        spark.readStream.schema(schema)
        .option("latestFirst", False)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    changes = src.groupBy("user_id").applyInPandasWithState(
        _detect_changes,
        outputStructType=CHANGE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        changes.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink_dir)


try:  # the ABC imports without protobuf; only the RUNNER needs it
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _TWS_BASE = StatefulProcessor
except ImportError:  # pragma: no cover - older pyspark
    _TWS_BASE = object


class ChangeDetectorProcessor(_TWS_BASE):
    """transformWithState twin of ``_detect_changes`` — module-level so
    the per-key logic is unit-testable with a fake handle even when the
    protobuf runner dependency is absent (tests/test_keyed_state.py
    drives it against the aIPWS detector for parity)."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._last = handle.getValueState("last", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        if self._last.exists():
            prev_us, prev_type = tuple(self._last.get())
        else:
            prev_us, prev_type = None, None
        frames = [b for b in rows if len(b)]
        cols = [f.name for f in CHANGE_SCHEMA.fields]
        if not frames:
            yield pd.DataFrame(columns=cols)
            return
        batch = pd.concat(frames, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        out = []
        for r in batch.itertuples(index=False):
            curr = r.event_type
            if prev_type is not None and curr != prev_type:
                out.append((r.event_id, user_id, prev_type, curr, r.ts))
            prev_type = curr
            prev_us = int(pd.Timestamp(r.ts).value // 1000)
        self._last.update((prev_us, prev_type))
        yield pd.DataFrame(out, columns=cols)

    def close(self) -> None:
        pass


def stream_status_changes_tws(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    sink_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Same change detector on ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-stateful API that supersedes
    ``applyInPandasWithState`` (named state variables, timers, TTL,
    initial-state bootstrap). Kept alongside the aIPWS form with a
    parity test so either API can serve the operator; TWS is the
    forward path (it requires the RocksDB state store, which is also
    the right store for billion-key state at scale).

    Requires ``protobuf`` (the TWS Python runner's wire format) —
    probed up front so an environment without it gets a clear
    ImportError instead of a mid-query worker crash.
    """
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(its Python runner speaks protobuf to the JVM); use "
            "stream_status_changes (applyInPandasWithState) instead"
        ) from e

    # transformWithState requires the RocksDB state store provider.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = (
        spark.readStream.schema(schema)
        .option("latestFirst", False)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    changes = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ChangeDetectorProcessor(),
        outputStructType=CHANGE_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    q = (
        changes.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink_dir)
