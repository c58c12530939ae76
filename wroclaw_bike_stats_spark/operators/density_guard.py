"""Pair-density circuit breaker for the similarity-graph family.

Motivation (round-13 episode, commit 242157e): SemDeDup at τ=0.8 on
whitened 8-dim vectors *percolated* — nearly every within-cluster pair
cleared the threshold, the pair graph went near-complete, and the
connected-components fixpoint walked a long-diameter giant component
(32/2000 rows kept, 27 s at toy scale). At 100 TB the same mis-chosen
τ is cluster-days of shuffle, not 27 s. Until round 14 the only
protection was callers picking the right τ at the call site.

What distinguishes percolation from an honestly duplicated corpus is
NOT the raw pair count — the τ=0.8 episode emitted only ~2.8 pairs
per node (measured: 5609 pairs / 2000 nodes), which a heavy-boilerplate
corpus can reach legitimately. The discriminator is component SHAPE:
percolation chains moderate-degree nodes into one giant SPARSE
component (the episode: one ~full-cluster component at ~4% edge
density, long diameter — exactly what makes the CC fixpoint walk for
27 s at toy scale / cluster-days at 100 TB), while honest duplicate
groups form small near-CLIQUES (density ≈ 1). SemDeDup pairs are
strictly within-cluster — a node lives in exactly one cluster — so
each per-cluster task sees its components COMPLETELY and can classify
them with an in-memory union-find over pairs it already holds.

Three layers, cheapest first:

1. **In-task breaker** (zero extra jobs — wired into every matmul
   pair emitter): (a) a hard anti-quadratic cap — tile by tile, when
   emitted pairs exceed ``max(max_pairs_per_node · nodes, floor)``
   the task raises :class:`PairDensityError` before the rest of the
   Gram is computed; (b) a percolation check
   (:func:`check_component_percolation`) on the cluster's finished
   pair set — a giant (> ``frac`` of the cluster) component whose
   edge density is below clique-land refuses BEFORE the pair table is
   materialized downstream and before connected-components ever sees
   the graph.
2. **Pre-flight estimator** (:func:`estimate_pair_density`) — two
   small jobs (a k-row cluster-size agg + a bounded deterministic
   sample) that predict the pair count WITHOUT running the matmul:
   candidate pairs Σcᵢ(cᵢ-1)/2 are known from sizes alone, and the
   above-threshold fraction is estimated from sampled within-cluster
   cosines. For operators sizing a 100 TB run before committing it
   (est_pairs_per_node ≳ 0.5, i.e. average degree ≳ 1, is the classic
   random-graph giant-component threshold — treat it as a red flag).
3. **Bucket guard** (:func:`check_bucket_sizes`) — opt-in eager check
   for the LSH candidate builders (MinHash bands, SimHash chunks),
   whose quadratic term is per-bucket: refuses before the self-join
   when any bucket exceeds ``max_bucket_size`` rows.

Calibration (measured at the driver gates): healthy graphs sit at
0.04–0.07 pairs/node with clique-shaped components → neither layer
fires; the τ=0.8 whitened case fires layer 1b. Callers with corpora
that genuinely form giant dense near-cliques acknowledge by raising
the knobs or passing ``None``/``False`` (off).

Reference parity: the reference repo has no similarity-graph
operators; this guard belongs to the beyond-reference LLM-pipeline
charter (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PairDensityError",
    "DEFAULT_MAX_PAIRS_PER_NODE",
    "DEFAULT_PERCOLATION_FRAC",
    "PREFLIGHT_GIANT_DEGREE",
    "check_cluster_density",
    "check_component_percolation",
    "estimate_pair_density",
    "maybe_refuse_pair_density",
    "pair_density_profile",
    "check_bucket_sizes",
]

#: HARD anti-quadratic cap: pairs-per-node above which a pair emitter
#: aborts mid-Gram. Deliberately generous (average degree 128) — its
#: job is stopping near-complete O(n²) emission early; the shape-aware
#: percolation check below is the sensitive layer.
DEFAULT_MAX_PAIRS_PER_NODE = 64.0

#: Absolute pair floor below which the hard cap never trips — a tiny
#: cluster holding one honest duplicate clique is not a blowup.
_PAIR_FLOOR = 1024

#: A component spanning more than this fraction of its cluster is
#: "giant" and gets its edge density inspected.
DEFAULT_PERCOLATION_FRAC = 0.5

#: Giant components smaller than this many nodes are never flagged —
#: the CC fixpoint handles them trivially regardless of shape.
_PERCOLATION_MIN_NODES = 64

#: Edge density (edges / C(k,2)) below which a giant component is a
#: percolation chain rather than an honest duplicate clique. Honest
#: groups sit near 1.0; the τ=0.8 episode measured ~0.04.
_PERCOLATION_MAX_DENSITY = 0.5


class PairDensityError(RuntimeError):
    """The similarity pair graph is too dense to be a dedup graph.

    Raised by the in-task breaker / bucket guard BEFORE the quadratic
    pair table is materialized. Almost always means the similarity
    threshold is below the percolation point of the vector space (the
    round-13 τ=0.8-on-whitened-vectors episode) or the LSH
    parameterization hashes unrelated content together. Fix the
    threshold / bands / num_clusters; raise the bound only if the
    corpus genuinely is that duplicated.
    """


def _density_limit(n_nodes: int, max_pairs_per_node: float) -> int:
    return max(int(max_pairs_per_node * n_nodes), _PAIR_FLOOR)


def check_cluster_density(
    n_pairs: int,
    n_nodes: int,
    max_pairs_per_node: float | None,
    context: str,
) -> None:
    """Raise :class:`PairDensityError` when a cluster's emitted-pair
    count exceeds ``max(max_pairs_per_node · n_nodes, floor)``.
    Pure function — safe to call inside applyInPandas workers; pass
    the running count tile-by-tile so a percolating cluster aborts at
    the first overflowing tile, not after the full Gram."""
    if max_pairs_per_node is None:
        return
    limit = _density_limit(n_nodes, max_pairs_per_node)
    if n_pairs > limit:
        raise PairDensityError(
            f"PairDensityError[{context}]: {n_pairs} similarity pairs "
            f"already emitted for {n_nodes} nodes (bound "
            f"{max_pairs_per_node} pairs/node, floor {_PAIR_FLOOR} -> "
            f"limit {limit}) — near-quadratic emission. The threshold "
            f"is likely below the duplicate boundary for this vector "
            f"space. Raise the threshold (or num_clusters), or pass "
            f"max_pairs_per_node=None/higher to override."
        )


def check_component_percolation(
    id_a,
    id_b,
    n_nodes: int,
    context: str,
    frac: float | None = DEFAULT_PERCOLATION_FRAC,
    new_ids=None,
) -> None:
    """Shape-aware percolation breaker over ONE cluster's finished
    pair set (``id_a``/``id_b``: equal-length sequences of pair
    endpoints — the arrays a matmul emitter already holds in memory).

    Runs an in-memory union-find (O(pairs · α)); flags when the
    largest component spans > ``frac`` of the cluster's ``n_nodes``
    AND its edge density is below ``_PERCOLATION_MAX_DENSITY`` — a
    giant SPARSE component is a percolation chain (threshold below
    the space's duplicate boundary), while a giant DENSE one is an
    honest duplicate clique and passes. Valid as a per-cluster check
    for SemDeDup because its pairs are strictly within-cluster:
    per-cluster components ARE the global components. ``frac=None``
    disables.

    ``new_ids``: for INCREMENTAL emitters that BY DESIGN omit
    old↔old edges (``semdedup_incremental_pairs``), the set of node
    ids belonging to the new batch. The density denominator is then
    the EMITTABLE pair count of the component — m·(k−m) + C(m,2)
    with m = new nodes among the component's k — instead of C(k,2):
    an honest duplicate clique of 120 resident + 10 new copies emits
    all 1245 emittable edges (density 1.0, passes) even though it
    holds only ~15% of C(130,2). Without this, any ≥64-node true
    duplicate group spanning more than half its cluster would trip
    the breaker whenever the new batch is a small fraction of it.
    ``None`` (the full-emitter default) keeps the C(k,2) denominator."""
    if frac is None:
        return
    n_pairs = len(id_a)
    if n_pairs == 0 or n_nodes < _PERCOLATION_MIN_NODES:
        return
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    edge_count: dict = {}
    for u, v in zip(id_a, id_b):
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
            edge_count[ru] = edge_count.get(ru, 0) + edge_count.pop(rv, 0) + 1
        else:
            edge_count[ru] = edge_count.get(ru, 0) + 1
    comp_size: dict = {}
    for x in parent:
        r = find(x)
        comp_size[r] = comp_size.get(r, 0) + 1
    # roots may have moved since an edge_count entry was written —
    # re-key counts onto final roots before sizing.
    final_edges: dict = {}
    for r, e in edge_count.items():
        final_edges[find(r)] = final_edges.get(find(r), 0) + e
    big_root = max(comp_size, key=comp_size.get)
    k = comp_size[big_root]
    if k <= max(_PERCOLATION_MIN_NODES, frac * n_nodes):
        return
    e = final_edges.get(big_root, 0)
    if new_ids is not None:
        m = sum(1 for x in parent if x in new_ids and find(x) == big_root)
        emittable = m * (k - m) + m * (m - 1) // 2
        if emittable == 0:
            return
        density = e / emittable
    else:
        density = e / (k * (k - 1) / 2)
    if density < _PERCOLATION_MAX_DENSITY:
        raise PairDensityError(
            f"PairDensityError[{context}]: percolation — the largest "
            f"duplicate component spans {k}/{n_nodes} cluster nodes at "
            f"edge density {density:.4f} (< {_PERCOLATION_MAX_DENSITY}"
            f"): a giant sparse component is a similarity-threshold "
            f"chain, not a duplicate group, and would send the "
            f"connected-components fixpoint on a long-diameter walk "
            f"at corpus scale. Raise the threshold for this vector "
            f"space (the round-13 fix: τ 0.8 → 0.9 on whitened "
            f"vectors), or pass percolation_frac=None to override."
        )


def estimate_pair_density(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_per_cluster: int = 64,
) -> dict:
    """Pre-flight estimate of a SemDeDup pair graph's density WITHOUT
    running the pairwise stage.

    Two bounded jobs on the ``(id, vec, centroid_id)`` assignment
    frame (``semdedup_assign``'s output): (1) per-cluster sizes — the
    candidate-pair mass Σcᵢ(cᵢ-1)/2 is exact from sizes alone; (2) a
    deterministic sample (the ``sample_per_cluster`` smallest ids per
    cluster — reproducible, no RNG) whose within-cluster cosine
    fraction ≥ threshold calibrates how much of that mass survives.

    Returns ``{"n_nodes", "candidate_pairs", "sampled_frac",
    "est_pairs", "est_pairs_per_node"}``. Compare
    ``est_pairs_per_node`` against :data:`DEFAULT_MAX_PAIRS_PER_NODE`
    before committing a cluster-scale run; the in-task breaker remains
    the hard backstop.
    """
    import numpy as np

    sizes = {
        r["centroid_id"]: r["n"]
        for r in assigned.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_nodes = int(sum(sizes.values()))
    candidate_pairs = int(sum(c * (c - 1) // 2 for c in sizes.values()))
    if candidate_pairs == 0:
        return {
            "n_nodes": n_nodes,
            "candidate_pairs": 0,
            "sampled_frac": 0.0,
            "est_pairs": 0,
            "est_pairs_per_node": 0.0,
        }
    # Deterministic per-cluster sample: rank by id within cluster via
    # the smallest-ids window, bounded collect (≤ k·sample rows).
    from pyspark.sql import Window

    w = Window.partitionBy("centroid_id").orderBy(id_col)
    sample = (
        assigned.select("centroid_id", id_col, vec_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= sample_per_cluster)
        .drop("_rn")
        .collect()
    )
    hits = tot = 0
    by_cluster: dict = {}
    for row in sample:
        by_cluster.setdefault(row["centroid_id"], []).append(row[vec_col])
    for cid, vecs in by_cluster.items():
        if len(vecs) < 2:
            continue
        E = np.asarray(vecs, dtype=np.float64)
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            En = E / norms
        S = np.round(En @ En.T, 6)
        iu, ju = np.triu_indices(len(vecs), k=1)
        sims = S[iu, ju]
        # weight each cluster's sampled fraction by its candidate mass
        c = sizes[cid]
        mass = c * (c - 1) // 2
        hits += float(np.mean(sims >= threshold)) * mass
        tot += mass
    frac = hits / tot if tot else 0.0
    est_pairs = int(frac * candidate_pairs)
    return {
        "n_nodes": n_nodes,
        "candidate_pairs": candidate_pairs,
        "sampled_frac": frac,
        "est_pairs": est_pairs,
        "est_pairs_per_node": est_pairs / n_nodes if n_nodes else 0.0,
    }


#: Pre-flight refusal threshold: estimated pairs per node at/above
#: which the FULL composed SemDeDup path refuses before scheduling
#: the Gram stage. 0.5 pairs/node = average degree 1, the classic
#: random-graph giant-component threshold; the healthy gated regimes
#: measure 0.04–0.3, the τ=0.8 percolation episode 2.8.
PREFLIGHT_GIANT_DEGREE = 0.5

#: Corpora below this node count skip the pre-flight entirely — the
#: in-task breaker handles them at negligible cost, and the sampled
#: estimator is noisy at tiny n (the driver gate corpora are 50–500
#: vectors and must stay byte-identical).
_PREFLIGHT_MIN_NODES = 1024


def maybe_refuse_pair_density(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_est_pairs_per_node: float = PREFLIGHT_GIANT_DEGREE,
    context: str = "semdedup_pairs",
) -> dict | None:
    """Default-on pre-flight for the composed SemDeDup plans (r14
    VERDICT task 4): run :func:`estimate_pair_density`'s two small
    jobs against the materialized assignment and raise
    :class:`PairDensityError` when the estimated pairs-per-node
    reaches ``max_est_pairs_per_node`` — BEFORE the matmul stage is
    ever scheduled. The in-task breaker (density cap + percolation
    shape check) remains the backstop for what a cluster-size-and-
    sample estimate cannot see.

    Returns the estimate dict, or None when the corpus is under
    ``_PREFLIGHT_MIN_NODES`` (skipped — tiny corpora are the in-task
    breaker's job, and the driver-gate corpora stay untouched).

    Deliberately NOT wired into ``semdedup_incremental_pairs``: a
    density-only signal cannot tell a legitimate resident duplicate
    group (whose old-old edges the increment omits by design) from a
    percolation chain — exactly the r14-ADVICE false positive the
    emittable-denominator percolation fix removed. The incremental
    path's protection is the in-task shape check with ``new_ids``.
    Dense-but-honest corpora on the FULL path acknowledge by passing
    ``preflight=False`` (the guard module's standing contract)."""
    est = estimate_pair_density(
        assigned, threshold, id_col=id_col, vec_col=vec_col
    )
    if est["n_nodes"] < _PREFLIGHT_MIN_NODES:
        return None
    if est["est_pairs_per_node"] >= max_est_pairs_per_node:
        raise PairDensityError(
            f"PairDensityError[{context}]: pre-flight — estimated "
            f"{est['est_pairs']} similarity pairs over "
            f"{est['n_nodes']} nodes ({est['est_pairs_per_node']:.2f} "
            f"pairs/node >= {max_est_pairs_per_node}, the giant-"
            f"component degree threshold; sampled above-threshold "
            f"fraction {est['sampled_frac']:.4f}). The threshold "
            f"{threshold} is likely below this vector space's "
            f"duplicate boundary — the pair stage was NOT scheduled. "
            f"Raise the threshold, or pass preflight=False if the "
            f"corpus genuinely is this duplicated (the in-task shape "
            f"breaker still protects the run)."
        )
    return est


def pair_density_profile(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_per_cluster: int = 64,
) -> DataFrame:
    """The pre-flight estimator's evidence as a DataFrame — one row
    per cluster, ALL-INTEGER columns so the profile is exactly
    SQL-reproducible (the driver gate's shape):

    (``centroid_id``, ``n_vectors``, ``candidate_pairs`` =
    n(n-1)/2, ``sampled_pairs``, ``sampled_hits``) where the sample
    is the deterministic ``sample_per_cluster`` smallest ids per
    cluster and a hit is a sampled within-cluster pair whose
    6-dp-rounded cosine clears ``threshold`` (the family rounding
    convention). ``sampled_hits / sampled_pairs × candidate_pairs``
    is the cluster's pair estimate — :func:`estimate_pair_density`
    is the driver-side scalar view of the same numbers. Pure native
    expressions: one row_number window for the sample, one
    within-cluster self-join of ≤64 rows per cluster, one agg."""
    from pyspark.sql import Window

    from wroclaw_bike_stats_spark.operators.similarity import cosine

    w = Window.partitionBy("centroid_id").orderBy(id_col)
    samp = (
        assigned.select("centroid_id", id_col, vec_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= sample_per_cluster)
        .drop("_rn")
    )
    a = samp.select(
        "centroid_id",
        F.col(id_col).alias("_ia"),
        F.col(vec_col).alias("_va"),
    )
    b = samp.select(
        "centroid_id",
        F.col(id_col).alias("_ib"),
        F.col(vec_col).alias("_vb"),
    )
    sampled = (
        a.join(b, "centroid_id")
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("sampled_pairs"),
            F.sum(
                (
                    F.round(cosine(F.col("_va"), F.col("_vb")), 6)
                    >= threshold
                ).cast("long")
            ).alias("sampled_hits"),
        )
    )
    sizes = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    return (
        sizes.join(sampled, "centroid_id", "left")
        .select(
            "centroid_id",
            "n_vectors",
            (
                F.col("n_vectors") * (F.col("n_vectors") - 1) / 2
            ).cast("long").alias("candidate_pairs"),
            F.coalesce("sampled_pairs", F.lit(0)).alias("sampled_pairs"),
            F.coalesce("sampled_hits", F.lit(0)).alias("sampled_hits"),
        )
    )


def check_bucket_sizes(
    banded: DataFrame,
    key_cols: list[str],
    max_bucket_size: int | None,
    context: str,
) -> None:
    """Opt-in eager guard for LSH candidate builders: refuse BEFORE
    the bucket self-join when any bucket exceeds ``max_bucket_size``
    rows (a B-row bucket contributes B(B-1)/2 candidate pairs). One
    small agg job; ``None`` (the default upstream) skips entirely so
    gated/bench paths are unchanged."""
    if max_bucket_size is None:
        return
    worst = (
        banded.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket_size)
        .orderBy(F.desc("n"))
        .limit(3)
        .collect()
    )
    if worst:
        desc = ", ".join(
            "(" + ", ".join(f"{k}={r[k]}" for k in key_cols) + f": {r['n']} rows)"
            for r in worst
        )
        raise PairDensityError(
            f"PairDensityError[{context}]: LSH bucket(s) over "
            f"max_bucket_size={max_bucket_size}: {desc}. A bucket of B "
            f"rows costs B(B-1)/2 candidate pairs — re-parameterize "
            f"(more bands / longer signatures / coarser shingles) or "
            f"raise/disable max_bucket_size."
        )
