"""Pair-density circuit breaker (operators/density_guard.py).

Covers the round-13 percolation episode (commit 242157e): SemDeDup at
τ=0.8 on whitened 8-dim vectors chained nearly every row into one
giant sparse component (32/2000 kept, long CC walk). The breaker must
refuse THAT case in-task while leaving every gated regime (τ=0.9
whitened, τ=0.4 raw, the planted-duplicate corpora) untouched.
"""

from __future__ import annotations

import numpy as np
import pytest

from wroclaw_bike_stats_spark.operators.density_guard import (
    PairDensityError,
    check_bucket_sizes,
    check_cluster_density,
    check_component_percolation,
    estimate_pair_density,
)

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


# ---------------------------------------------------------------- pure units


def test_hard_cap_pure():
    # under the floor: never trips regardless of ratio
    check_cluster_density(1000, 10, 8.0, "t")
    # over limit
    with pytest.raises(PairDensityError, match="near-quadratic"):
        check_cluster_density(2000, 100, 8.0, "t")
    # disabled
    check_cluster_density(10**9, 10, None, "t")


def test_percolation_path_graph_trips():
    # 200-node path: one giant component, density ~= 2/k -> percolation
    a = list(range(199))
    b = list(range(1, 200))
    with pytest.raises(PairDensityError, match="percolation"):
        check_component_percolation(a, b, 200, "t")


def test_percolation_clique_passes():
    # 200-node clique: giant but DENSE -> an honest duplicate group
    iu, ju = np.triu_indices(200, k=1)
    check_component_percolation(iu.tolist(), ju.tolist(), 200, "t")


def test_percolation_small_and_disabled_pass():
    # below the min-node floor: a 30-node path in a 40-node cluster
    a, b = list(range(29)), list(range(1, 30))
    check_component_percolation(a, b, 40, "t")
    # disabled via frac=None even for the tripping shape
    check_component_percolation(
        list(range(199)), list(range(1, 200)), 200, "t", frac=None
    )


def test_percolation_incremental_clique_emittable_denominator():
    """r14 ADVICE (high): an incremental emitter omits old-old edges
    by design, so an honest 120-old + 10-new duplicate clique emits
    only m(k-m)+C(m,2) = 1245 of C(130,2) = 8385 edges. With the
    C(k,2) denominator that is density 0.148 -> a false refusal; with
    new_ids the denominator is the emittable count -> density 1.0."""
    old_ids = list(range(120))
    new_ids = list(range(1000, 1010))
    a, b = [], []
    for nid in new_ids:
        for oid in old_ids:
            a.append(min(nid, oid))
            b.append(max(nid, oid))
    for i, n1 in enumerate(new_ids):
        for n2 in new_ids[i + 1 :]:
            a.append(n1)
            b.append(n2)
    assert len(a) == 10 * 120 + 45
    # legacy denominator (no new_ids): the documented false positive
    with pytest.raises(PairDensityError, match="percolation"):
        check_component_percolation(a, b, 200, "t")
    # emittable denominator: honest clique passes
    check_component_percolation(a, b, 200, "t", new_ids=set(new_ids))


def test_percolation_incremental_sparse_chain_still_trips():
    """new_ids must not blind the breaker: a new batch whose members
    each touch ONE old node apiece (a sparse star forest chained into
    one giant component through shared old nodes) stays refused."""
    # 100 new nodes, each linked to 2 old nodes arranged in a chain:
    # new_i -- old_i, new_i -- old_{i+1} => one giant sparse component
    a, b = [], []
    for i in range(100):
        nid = 1000 + i
        a += [min(nid, i), min(nid, i + 1)]
        b += [max(nid, i), max(nid, i + 1)]
    with pytest.raises(PairDensityError, match="percolation"):
        check_component_percolation(
            a, b, 250, "t", new_ids=set(range(1000, 1100))
        )


def test_percolation_many_small_cliques_pass():
    # heavy-duplication corpus shape: 30 disjoint 10-cliques in a
    # 300-node cluster — 1350 pairs (4.5/node) but NO giant component
    iu, ju = np.triu_indices(10, k=1)
    a, b = [], []
    for g in range(30):
        a += (iu + 10 * g).tolist()
        b += (ju + 10 * g).tolist()
    check_component_percolation(a, b, 300, "t")


# ------------------------------------------------------- the round-13 case


@pytest.fixture(scope="module")
def whitened_sf01(spark):
    from wroclaw_bike_stats_spark.operators.embedding_stats import (
        fit_pca,
        pca_project,
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    model = fit_pca(emb, k=8)
    return (
        pca_project(emb, model, whiten=True)
        .select("vec_id", "embedding_pca")
        .cache()
    )


def test_tau08_whitened_refused_at_preflight(spark, whitened_sf01):
    """THE episode: τ=0.8 on whitened 8-dim vectors percolates. r15
    (r14 VERDICT task 4): the default-on pre-flight refuses at PLAN
    CONSTRUCTION — the Gram stage is never scheduled."""
    from wroclaw_bike_stats_spark.operators.semdedup import semdedup_pairs

    with pytest.raises(PairDensityError, match="pre-flight"):
        semdedup_pairs(whitened_sf01, threshold=0.8, vec_col="embedding_pca")


def test_tau08_whitened_in_task_backstop_still_trips(spark, whitened_sf01):
    """With the pre-flight acknowledged away (preflight=False), the
    in-task breaker remains the backstop and still refuses inside the
    matmul tasks."""
    from wroclaw_bike_stats_spark.operators.semdedup import semdedup_pairs

    pairs = semdedup_pairs(
        whitened_sf01, threshold=0.8, vec_col="embedding_pca",
        preflight=False,
    )
    with pytest.raises(Exception, match="PairDensityError"):
        pairs.count()


def test_tau09_whitened_gate_regime_passes(spark, whitened_sf01):
    """The retuned gate value (τ=0.9, commit 242157e) must be
    untouched by the default breaker."""
    from wroclaw_bike_stats_spark.operators.semdedup import semdedup_pairs

    n = semdedup_pairs(
        whitened_sf01, threshold=0.9, vec_col="embedding_pca"
    ).count()
    assert n > 0


def test_raw_gate_regime_unchanged(spark):
    """Default breaker is a no-op for the gated raw-space regime:
    identical pair multiset with the guard on and off."""
    from wroclaw_bike_stats_spark.operators.semdedup import (
        semdedup_assign,
        semdedup_pairs,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    _, assigned = semdedup_assign(emb, num_clusters=8)
    assigned = assigned.cache()
    on = semdedup_pairs(emb, threshold=0.4, assigned=assigned)
    off = semdedup_pairs(
        emb,
        threshold=0.4,
        assigned=assigned,
        max_pairs_per_node=None,
        percolation_frac=None,
    )
    assert sorted(map(tuple, on.collect())) == sorted(
        map(tuple, off.collect())
    )


def test_incremental_percolation_trips(spark, whitened_sf01):
    """The incremental emitter carries the same breaker: re-ingesting
    a slice of the percolating space at τ=0.8 must refuse."""
    from wroclaw_bike_stats_spark.operators.semdedup import (
        semdedup_assign,
        semdedup_incremental_pairs,
    )
    import pyspark.sql.functions as F

    old = whitened_sf01.filter(F.col("vec_id") % 2 == 0)
    new = whitened_sf01.filter(F.col("vec_id") % 2 == 1)
    centroids, old_assigned = semdedup_assign(
        old, num_clusters=8, vec_col="embedding_pca"
    )
    inc = semdedup_incremental_pairs(
        new,
        old_assigned,
        centroids,
        threshold=0.8,
        vec_col="embedding_pca",
    )
    with pytest.raises(Exception, match="PairDensityError"):
        inc.count()


# ------------------------------------------------------------- pre-flight


def test_estimate_pair_density_predicts_percolation(spark, whitened_sf01):
    from wroclaw_bike_stats_spark.operators.semdedup import semdedup_assign

    _, assigned = semdedup_assign(
        whitened_sf01, num_clusters=8, vec_col="embedding_pca"
    )
    assigned = assigned.cache()
    hot = estimate_pair_density(
        assigned, threshold=0.8, vec_col="embedding_pca"
    )
    cold = estimate_pair_density(
        assigned, threshold=0.9, vec_col="embedding_pca"
    )
    # τ=0.8 measured ~2.8 pairs/node (giant-component regime, degree
    # >> 1); τ=0.9 measured ~0.3. The estimator must order them and
    # put τ=0.8 above the classic degree-1 percolation threshold.
    assert hot["est_pairs_per_node"] > 0.5
    assert hot["est_pairs_per_node"] > 3 * cold["est_pairs_per_node"]
    assert hot["candidate_pairs"] == cold["candidate_pairs"] > 0
    assert hot["n_nodes"] == 2000


# ------------------------------------------------------------ bucket guard


@pytest.fixture(scope="module")
def clone_docs(spark):
    text = "the same boilerplate sentence repeated across many docs"
    rows = [(i, text) for i in range(40)] + [
        (100 + i, f"unique document number {i} with its own words {i*7}")
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_minhash_bucket_guard(spark, clone_docs):
    from wroclaw_bike_stats_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    sigs = minhash_signatures(clone_docs).cache()
    # default: off -> works
    assert minhash_lsh_candidates(sigs).count() > 0
    # opt-in: the 40-clone bucket exceeds 10
    with pytest.raises(PairDensityError, match="bucket"):
        minhash_lsh_candidates(sigs, max_bucket_size=10)
    # generous bound passes
    assert minhash_lsh_candidates(sigs, max_bucket_size=64).count() > 0


def test_simhash_bucket_guard(spark, clone_docs):
    from wroclaw_bike_stats_spark.operators.dedup import simhash_neardup_pairs

    assert simhash_neardup_pairs(clone_docs).count() > 0
    with pytest.raises(PairDensityError, match="bucket"):
        simhash_neardup_pairs(clone_docs, max_bucket_size=10)


def test_check_bucket_sizes_reports_worst(spark):
    import pyspark.sql.functions as F

    banded = spark.range(100).select(
        F.lit(0).alias("band_idx"), F.lit(7).alias("band_hash"), "id"
    )
    with pytest.raises(PairDensityError, match="band_hash=7: 100 rows"):
        check_bucket_sizes(banded, ["band_idx", "band_hash"], 50, "t")
    check_bucket_sizes(banded, ["band_idx", "band_hash"], 100, "t")
    check_bucket_sizes(banded, ["band_idx", "band_hash"], None, "t")


def test_pair_density_profile_matches_estimator(spark, whitened_sf01):
    """pair_density_profile's integer evidence must scale into
    estimate_pair_density's numbers exactly: Σ candidate_pairs, total
    nodes, and the mass-weighted sampled fraction agree between the
    DataFrame (gate) form and the driver-side scalar form."""
    from wroclaw_bike_stats_spark.operators.density_guard import (
        pair_density_profile,
    )
    from wroclaw_bike_stats_spark.operators.semdedup import semdedup_assign

    _, assigned = semdedup_assign(
        whitened_sf01, num_clusters=8, vec_col="embedding_pca"
    )
    assigned = assigned.cache()
    prof = pair_density_profile(
        assigned, threshold=0.8, vec_col="embedding_pca"
    ).collect()
    est = estimate_pair_density(
        assigned, threshold=0.8, vec_col="embedding_pca"
    )
    assert sum(r["n_vectors"] for r in prof) == est["n_nodes"] == 2000
    assert sum(r["candidate_pairs"] for r in prof) == est["candidate_pairs"]
    hits = sum(
        (r["sampled_hits"] / r["sampled_pairs"]) * r["candidate_pairs"]
        for r in prof
        if r["sampled_pairs"] > 0
    )
    mass = sum(
        r["candidate_pairs"] for r in prof if r["sampled_pairs"] > 0
    )
    assert est["sampled_frac"] == pytest.approx(hits / mass)
