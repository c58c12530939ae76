"""SemDeDup (operators/semdedup.py): cluster-scoped semantic dedup.

Synthetic corpus with PLANTED duplicate groups: a few well-separated
base directions, each duplicated with tiny noise — near-identical
cosine (>0.99) inside a group, low cosine across groups. Assertions
are against the planted ground truth plus route differentials
(cluster_matmul vs join), never against a re-derivation of the same
code path.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import scratch
from wroclaw_bike_stats_spark.operators import semdedup as SD

DIM = 16
THRESH = 0.9


def _mk_corpus(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, DIM))
    rows = []
    groups = []
    # ids 0..5 = ONE member per group: num_clusters=6 samples the 6
    # smallest ids as centroids (ivf_assign), so each centroid is a
    # distinct planted direction. (Giving one group's near-identical
    # dups ids 0,1,2 makes three ~identical centroids that split the
    # group across clusters — real corpora hit that with k-means or a
    # larger k; the sampled-centroid path needs diverse seeds.)
    vid = 6
    for g in range(6):
        n_dup = [3, 1, 4, 2, 1, 5][g]  # groups of 1 are singletons
        rows.append((g, [float(x) for x in base[g] + rng.normal(scale=0.01, size=DIM)]))
        ids = [g]
        for _ in range(n_dup - 1):
            v = base[g] + rng.normal(scale=0.01, size=DIM)
            rows.append((vid, [float(x) for x in v]))
            ids.append(vid)
            vid += 1
        groups.append(ids)
    # noise vectors, far from everything with high probability
    for _ in range(20):
        rows.append((vid, [float(x) for x in rng.normal(size=DIM)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, groups


@pytest.fixture(scope="module")
def corpus(spark):
    df, groups = _mk_corpus(spark)
    return df.cache(), groups


def _brute_pairs(spark, df):
    from wroclaw_bike_stats_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    return embedding_neardup_pairs(df, threshold=THRESH, method="bruteforce")


def test_pairs_routes_agree(spark, corpus):
    df, _ = corpus
    mm = SD.semdedup_pairs(df, num_clusters=6, threshold=THRESH)
    jn = SD.semdedup_pairs(
        df, num_clusters=6, threshold=THRESH, pair_method="join"
    )
    a = {(r.id_a, r.id_b, r.cosine_sim) for r in mm.collect()}
    b = {(r.id_a, r.id_b, r.cosine_sim) for r in jn.collect()}
    assert a == b
    assert len(a) > 0


def test_recall_vs_bruteforce(spark, corpus):
    """Planted near-identical dups land in one cluster — recall vs the
    all-pairs brute force should be high (cross-cluster misses are the
    documented approximation; near-identical pairs survive it)."""
    df, _ = corpus
    exact = {(r.id_a, r.id_b) for r in _brute_pairs(spark, df).collect()}
    got = {
        (r.id_a, r.id_b)
        for r in SD.semdedup_pairs(df, num_clusters=6, threshold=THRESH).collect()
    }
    assert got <= exact  # within-cluster pairs are a subset of all pairs
    assert len(got) / len(exact) >= 0.9


def test_keep_min_id_collapses_planted_groups(spark, corpus):
    df, groups = corpus
    kept = {
        r.vec_id
        for r in SD.semdedup_keep(df, num_clusters=6, threshold=THRESH).collect()
    }
    for ids in groups:
        present = kept & set(ids)
        # group collapsed to exactly its min id (if the cluster stage
        # kept the group together — asserted via recall above)
        if len(present) == 1:
            assert present == {min(ids)}
    # singleton groups and noise vectors are always kept
    n_noise = df.count() - sum(len(g) for g in groups)
    assert len(kept) >= n_noise + len(groups)


def test_far_from_centroid_keeps_least_prototypical(spark):
    """3 near-dups at increasing distance from the cluster centroid:
    the paper rule keeps the farthest-from-centroid member, not the
    min id."""
    base = np.zeros(DIM)
    base[0] = 1.0
    off = np.zeros(DIM)
    off[1] = 1.0
    rows = []
    # num_clusters=1 with the sampled centroid = the min-id vector
    # (ivf_assign seeds from ids ascending) -> centroid is the anchor
    rows.append((0, [float(x) for x in base]))
    # dup group: progressively rotated away from the anchor; all
    # pairwise cosines stay >= cos(0.04) ~ 0.999 (within-group) while
    # centroid similarity strictly decreases with the angle
    for j, ang in enumerate((0.20, 0.22, 0.24)):
        v = np.cos(ang) * base + np.sin(ang) * off
        rows.append((10 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = {
        r.vec_id
        for r in SD.semdedup_keep(
            df, num_clusters=1, threshold=0.99, keep="far_from_centroid"
        ).collect()
    }
    # group {10,11,12} collapses to 12 (farthest from centroid);
    # the anchor itself is near-dup of nothing at 0.99? cos(0.20)=0.980
    # < 0.99, so the anchor stays a singleton.
    assert kept == {0, 12}


def test_stats_consistent(spark, corpus):
    df, _ = corpus
    stats = SD.semdedup_stats(df, num_clusters=6, threshold=THRESH)
    rows = stats.collect()
    assert sum(r.n_vectors for r in rows) == df.count()
    n_pairs = SD.semdedup_pairs(df, num_clusters=6, threshold=THRESH).count()
    assert sum(r.n_dup_pairs for r in rows) == n_pairs


def test_zero_norm_vector_never_duplicates(spark):
    rows = [(0, [1.0] * DIM), (1, [1.0] * DIM), (2, [0.0] * DIM)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = SD.semdedup_pairs(df, num_clusters=1, threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}
    kept = {r.vec_id for r in SD.semdedup_keep(df, num_clusters=1).collect()}
    assert kept == {0, 2}


def test_blocked_gram_equals_unblocked(spark, corpus, monkeypatch):
    """The Gram tiling (hot-cluster memory guard) must not change the
    pair set: force tiny tiles and compare against the join route."""
    df, _ = corpus
    monkeypatch.setattr(SD, "_GRAM_BLOCK", 3)
    tiled = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in SD.semdedup_pairs(df, num_clusters=6, threshold=THRESH).collect()
    }
    jn = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in SD.semdedup_pairs(
            df, num_clusters=6, threshold=THRESH, pair_method="join"
        ).collect()
    }
    assert tiled == jn and len(tiled) > 0


def test_incremental_equals_full_restricted(spark, corpus):
    """With centroids held fixed (the standing-asset contract), the
    incremental pair set EQUALS the full recompute's pairs restricted
    to pairs touching the new batch — an equality, not a recall bound."""
    df, _ = corpus
    new = df.filter(F.col("vec_id") % 5 == 0)
    old = df.filter(F.col("vec_id") % 5 != 0)
    centroids, old_assigned = SD.semdedup_assign(old, num_clusters=6)
    # full reference under the SAME centroids
    all_assigned = SD.assign_to_centroids(df, centroids)
    full = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in SD.semdedup_pairs(
            df, threshold=THRESH, assigned=all_assigned
        ).collect()
    }
    new_ids = {r.vec_id for r in new.collect()}
    expect = {
        p for p in full if p[0] in new_ids or p[1] in new_ids
    }
    got = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in SD.semdedup_incremental_pairs(
            new, old_assigned, centroids, threshold=THRESH
        ).collect()
    }
    assert got == expect
    # sanity: old-old pairs exist in full but are excluded here
    assert any(p not in expect for p in full) or len(full) == len(expect)
    assert len(got) > 0


def test_incremental_routes_agree(spark, corpus):
    df, _ = corpus
    new = df.filter(F.col("vec_id") % 5 == 0)
    old = df.filter(F.col("vec_id") % 5 != 0)
    centroids, old_assigned = SD.semdedup_assign(old, num_clusters=6)
    kw = dict(threshold=THRESH)
    mm = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in SD.semdedup_incremental_pairs(
            new, old_assigned, centroids, **kw
        ).collect()
    }
    jn = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in SD.semdedup_incremental_pairs(
            new, old_assigned, centroids, pair_method="join", **kw
        ).collect()
    }
    assert mm == jn and len(mm) > 0
    # thinned assignment table route: vectors supplied separately
    thin = old_assigned.select("vec_id", "centroid_id")
    via_vectors = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in SD.semdedup_incremental_pairs(
            new, thin, centroids, old_vectors=old, **kw
        ).collect()
    }
    assert via_vectors == mm


def test_incremental_large_old_clique_small_new_batch_passes(spark):
    """r14 ADVICE (high) regression: a LEGITIMATE duplicate group —
    120 resident copies + 10 new copies of the same content, all in
    one cluster spanning >half of it — must NOT trip the percolation
    breaker on the incremental path. The emitter omits old-old edges
    by design, so against C(k,2) this honest clique looked 0.148-
    sparse; the emittable-denominator fix sees density 1.0."""
    rng = np.random.default_rng(11)
    v = rng.normal(size=DIM)
    w = rng.normal(size=DIM)  # a second direction so k-means has 2 seeds
    # id 0 -> v-group, id 1 -> w-group: the sampled-centroid path
    # seeds from the smallest ids, so the two seeds must be the two
    # distinct planted directions (same trick as _mk_corpus).
    rows = [(0, [float(x) for x in v])] + [
        (1 + i, [float(x) for x in v + rng.normal(scale=0.001, size=DIM)])
        for i in range(1, 120)
    ]
    rows += [(1, [float(x) for x in w])] + [
        (200 + i, [float(x) for x in w + rng.normal(scale=0.001, size=DIM)])
        for i in range(39)
    ]
    old = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    new_rows = [
        (1000 + i, [float(x) for x in v + rng.normal(scale=0.001, size=DIM)])
        for i in range(10)
    ]
    new = spark.createDataFrame(
        new_rows, "vec_id long, embedding array<float>"
    )
    centroids, old_assigned = SD.semdedup_assign(old, num_clusters=2)
    got = SD.semdedup_incremental_pairs(
        new, old_assigned, centroids, threshold=THRESH
    ).collect()
    # every emittable pair of the clique: 10*120 new-old + C(10,2)
    assert len(got) == 10 * 120 + 45
    new_ids = {1000 + i for i in range(10)}
    assert all(r.id_a in new_ids or r.id_b in new_ids for r in got)


def test_threshold_defaults_shared():
    """Default-argument use must not violate the incremental equality
    contract: every entry point defaults to the SAME module-level
    duplicate threshold."""
    import inspect

    for fn in (SD.semdedup_pairs, SD.semdedup_keep, SD.semdedup_incremental_pairs):
        assert (
            inspect.signature(fn).parameters["threshold"].default
            == SD.DEFAULT_THRESHOLD
        ), fn.__name__


def test_keep_small_graph_routes_cc_to_driver(spark, corpus):
    """r15: with the pre-flight on and the density estimate bounding
    the pair graph under ``DRIVER_EDGES_MAX``, ``semdedup_keep``
    scratch-persists the internally-built pair graph so
    ``connected_components`` resolves it driver-side (LocalTableScan
    in the executed plan — no two-phase machinery). An
    acknowledged-dense corpus (``preflight=False``) must NOT take the
    persist (unknown density → two-phase route), and both routes must
    return identical rows."""
    df, _ = corpus
    # drop pair graphs persisted by earlier tests in this module —
    # Spark's cache is plan-keyed, so an identical plan persisted by
    # a previous semdedup_keep call would alias into this test
    scratch.release()

    # unguarded FIRST: same reason, within this test, for why the
    # guarded call must come second — once it persists the pair
    # graph, an identical unguarded plan would read the same cache
    # entry and take the fast path too
    unguarded = SD.semdedup_keep(
        df, num_clusters=6, threshold=THRESH, preflight=False
    )
    cold_plan = unguarded._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD[node#" in cold_plan  # two-phase checkpointed route

    guarded = SD.semdedup_keep(df, num_clusters=6, threshold=THRESH)
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    # driver-resolved components: a LocalTableScan and NO checkpointed
    # two-phase result (which would plan as a Scan ExistingRDD over
    # the (node, component_id) labels; the corpus's own createDataFrame
    # ExistingRDD is named [vec_id, embedding] and doesn't match)
    assert "LocalTableScan" in plan
    assert "ExistingRDD[node#" not in plan

    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )
