"""Connected components + canonical-keep dedup
(operators/components.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators.components import (
    connected_components,
    keep_canonical,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["id_a", "id_b"])


def _comp_map(df):
    return {r.node: r.component_id for r in df.collect()}


def test_chain_and_island(spark):
    """Chain 1-2-3 plus island {10,11}: min-id labeling, both shapes."""
    got = _comp_map(connected_components(_pairs(spark, [(1, 2), (2, 3), (10, 11)])))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges(spark):
    """A 12-node path is the worst case for label propagation (max
    diameter per edge count) — still converges within max_iter."""
    edges = [(i, i + 1) for i in range(1, 12)]
    got = _comp_map(connected_components(_pairs(spark, edges)))
    assert got == {i: 1 for i in range(1, 13)}


def test_max_iter_failure_is_loud(spark):
    """hashmin's round count is exactly the propagation distance, so a
    12-node path cannot converge in 2 rounds. (twophase contracts the
    path inside partitions first — its bound applies to the contracted
    graph, which can legitimately converge faster; see below.)"""
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, [(i, i + 1) for i in range(1, 12)]),
                             max_iter=2, method="hashmin")


def test_twophase_single_partition_needs_no_fixpoint(spark):
    """With all edges in one partition, union-find resolves everything
    locally — even max_iter=0 succeeds (no contracted fixpoint runs)."""
    edges = _pairs(spark, [(i, i + 1) for i in range(1, 12)]).repartition(1)
    got = _comp_map(connected_components(edges, max_iter=0))
    assert got == {i: 1 for i in range(1, 13)}


def test_twophase_matches_hashmin(spark):
    """Differential: the two-phase scheme and the plain fixpoint agree
    on a graph mixing chains, cliques and singles, at two different
    input partitionings (result must be partitioning-invariant)."""
    edges = (
        [(i, i + 1) for i in range(1, 8)]          # chain 1..8
        + [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]  # clique
        + [(50, 51), (60, 61), (60, 62)]
    )
    want = _comp_map(
        connected_components(_pairs(spark, edges), method="hashmin")
    )
    for n_parts in (1, 7, 32):
        got = _comp_map(
            connected_components(_pairs(spark, edges).repartition(n_parts))
        )
        assert got == want


def test_rebalance_edges_matches_and_spreads(spark):
    """ADVICE r06: shuffle-fed skewed edge lists can pile into one
    partition, unbounding phase 1's Python dict. rebalance_edges=True
    round-robins the edge list to the session shuffle parallelism
    first — same result (phase 1 is partition-arbitrary), bounded
    partitions."""
    edges = [(i, i + 1) for i in range(1, 16)] + [(100, 101), (200, 201)]
    skewed = _pairs(spark, edges).coalesce(1)  # everything in one task
    want = _comp_map(connected_components(_pairs(spark, edges), method="hashmin"))
    got = _comp_map(connected_components(skewed, rebalance_edges=True))
    assert got == want


def test_driver_resolve_matches_fixpoint(spark):
    """r15: the contracted boundary graph is resolved with DRIVER-side
    union-find when it fits ``driver_links_max``; forcing the bound to
    0 (fixpoint) and to a huge value (driver) must give identical
    components on a multi-partition graph whose boundary is non-empty,
    and both must match plain hashmin."""
    edges = (
        [(i, i + 1) for i in range(1, 20)]                      # long chain
        + [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
        + [(500, 501), (600, 601), (600, 602), (601, 603)]
    )
    want = _comp_map(
        connected_components(_pairs(spark, edges), method="hashmin")
    )
    df = _pairs(spark, edges).repartition(16)
    got_driver = _comp_map(connected_components(df, driver_links_max=10**6))
    got_fix = _comp_map(connected_components(df, driver_links_max=0))
    assert got_driver == want
    assert got_fix == want


def test_driver_resolve_overflow_falls_back(spark):
    """A driver_links_max smaller than the boundary-link count must
    fall back to the distributed fixpoint and still be correct."""
    edges = [(i, i + 1) for i in range(1, 20)]
    df = _pairs(spark, edges).repartition(16)
    want = _comp_map(connected_components(_pairs(spark, edges), method="hashmin"))
    got = _comp_map(connected_components(df, driver_links_max=2))
    assert got == want


def test_persisted_small_edges_resolve_on_driver(spark):
    """r15: a PERSISTED edge list under ``driver_links_max`` is
    resolved entirely driver-side and returned as a LocalRelation —
    no phase-1 pass, no boundary shuffle — with labels identical to
    both distributed routes. Un-persisted inputs must NOT take the
    fast path (the probe could recompute an expensive upstream), and
    an over-bound persisted list must fall back, both still correct."""
    edges = (
        [(i, i + 1) for i in range(1, 9)]
        + [(a, b) for a in range(30, 34) for b in range(a + 1, 34)]
        + [(70, 71)]
    )
    want = _comp_map(
        connected_components(_pairs(spark, edges), method="hashmin")
    )

    persisted = _pairs(spark, edges).persist()
    try:
        got = connected_components(persisted, rebalance_edges=True)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "LocalTableScan" in plan  # driver-resolved fast path
        assert _comp_map(got) == want

        # bound smaller than the edge count: distributed route, same labels
        got_over = connected_components(persisted, driver_links_max=3)
        assert _comp_map(got_over) == want
    finally:
        persisted.unpersist()

    cold = connected_components(_pairs(spark, edges))
    cold_plan = cold._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in cold_plan  # no probe on un-persisted input
    assert _comp_map(cold) == want


def test_unknown_method_raises(spark):
    with pytest.raises(ValueError, match="unknown method"):
        connected_components(_pairs(spark, [(1, 2)]), method="bfs")


def test_orientation_and_duplicates_ignored(spark):
    """Edge direction and repeated pairs don't change components."""
    got = _comp_map(
        connected_components(_pairs(spark, [(5, 4), (4, 5), (5, 4), (4, 3)]))
    )
    assert got == {3: 3, 4: 3, 5: 3}


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 7)], ["doc_id", "text"]
    )
    kept = keep_canonical(docs, _pairs(spark, [(1, 2), (2, 3), (5, 6)]))
    # clusters {1,2,3} → keep 1; {5,6} → keep 5; singleton 4 kept
    assert sorted(r.doc_id for r in kept.collect()) == [1, 4, 5]


def test_components_close_over_real_pairs(spark):
    """Every near-dup pair's endpoints land in the same component on
    the real documents table."""
    import __spark_entry__ as e

    pairs = e.q_ngram_jaccard(spark, "/root/testdata/sf0.001")
    comp = connected_components(pairs)
    joined = (
        pairs.join(
            comp.select(F.col("node").alias("id_a"),
                        F.col("component_id").alias("ca")), "id_a")
        .join(
            comp.select(F.col("node").alias("id_b"),
                        F.col("component_id").alias("cb")), "id_b")
    )
    assert joined.filter(F.col("ca") != F.col("cb")).count() == 0
    assert pairs.count() > 0


def test_neardup_route_auto_picks_by_corpus_size(spark):
    """candidate_route="auto" (the round-9 default): exact under the
    measured crossover, banded above it; at fixture scale auto ==
    exact byte-for-byte (the probe picks exact for 500 docs)."""
    from wroclaw_bike_stats_spark.operators.dedup import (
        NEARDUP_EXACT_MAX_DOCS,
        neardup_components,
        pick_neardup_route,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    assert n <= NEARDUP_EXACT_MAX_DOCS
    assert pick_neardup_route(docs) == "exact"
    assert pick_neardup_route(docs, max_exact_docs=n - 1) == "banded"

    # round-10 n_docs hint: zero-job probe, boundary inclusive on the
    # exact side
    assert pick_neardup_route(docs, n_docs=NEARDUP_EXACT_MAX_DOCS) == "exact"
    assert (
        pick_neardup_route(docs, n_docs=NEARDUP_EXACT_MAX_DOCS + 1)
        == "banded"
    )

    # an auto->banded flip is loud (ADVICE r09: silent result drift at
    # the crossover) — plan construction alone must warn
    import pytest as _pytest

    with _pytest.warns(UserWarning, match="banded LSH candidates"):
        neardup_components(
            docs, threshold=0.5, n_docs=NEARDUP_EXACT_MAX_DOCS + 1
        )

    got_auto = {
        (r.node, r.component_id)
        for r in neardup_components(docs, threshold=0.5).collect()
    }
    got_exact = {
        (r.node, r.component_id)
        for r in neardup_components(
            docs, threshold=0.5, candidate_route="exact"
        ).collect()
    }
    assert got_auto == got_exact
    assert got_auto, "vacuous: fixture corpus has no near-dup pairs"
