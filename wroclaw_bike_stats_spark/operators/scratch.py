"""Session-scoped registry for scratch-persisted DataFrames.

Iterative and multi-consumer operators (shingle tables, LSH candidate
sets, connected-components label checkpoints) persist intermediates
that are live only while the query that built them executes. Leaking
one persist per call is the classic resident-service failure mode —
this registry gives them a lifecycle: each build registers its
persisted frames, and ``release()`` (invoked by the next query build
in the same family, or by a harness at section boundaries) unpersists
everything, so at most one query's scratch stays pinned.

Unpersisting is always safe for ``persist()`` frames (lineage
recomputes); for ``localCheckpoint()`` frames the caller must only
release AFTER the consuming action — which is exactly the contract
here: release happens at the *next* query build, never mid-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed frame for release."""
    _SCRATCH.append(df)
    return df


def persist(df: DataFrame) -> DataFrame:
    """Persist a frame and register it for release."""
    return track(df.persist())


def release() -> None:
    """Unpersist every registered scratch frame."""
    while _SCRATCH:
        try:
            _SCRATCH.pop().unpersist()
        except Exception:  # noqa: BLE001 - session may already be gone
            pass
