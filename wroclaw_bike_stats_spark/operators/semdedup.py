"""SemDeDup: cluster-scoped semantic deduplication.

Spark-first re-expression of the SemDeDup recipe (Abbas et al.,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540): instead of a corpus-wide near-dup
search, cluster the embedding space coarsely, compare vectors only
WITHIN their cluster, and keep one representative per duplicate
group. Cross-cluster duplicates are missed BY DESIGN — that is
exactly what turns the O(n²) pairwise cost into O(Σ cᵢ²), and recall
vs brute force is measured in tests/test_semdedup.py rather than
assumed.

Pipeline (every stage reuses an existing scale-shaped operator):

1. k coarse centroids — deterministic corpus sample
   (``similarity.ivf_assign``), optionally Lloyd-refined
   (``kmeans_refine``); every vector assigned to its nearest centroid
   by the zero-Exchange Arrow-matmul ``assign_to_centroids``.
2. Pairwise cosine within each cluster only. Default route
   (``pair_method="cluster_matmul"``): one ``applyInPandas`` task per
   cluster computes the normalized Gram matrix with a single matmul
   and emits only the upper-triangle pairs ≥ threshold. Per-task
   memory is O(cᵢ·dim + cᵢ²) — the SemDeDup contract is that
   ``num_clusters`` scales with the corpus so cluster sizes stay
   bounded (the paper runs k=50 000 over LAION-440M ≈ 9k
   vectors/cluster; at 100 TB pick k ≈ n / 10k and the Gram matrix
   stays ≤ ~1 GB/task). ``pair_method="join"`` is the relational
   fallback — within-cluster candidate equi-join + the shared
   ``similarity._cosine_verify`` — kept for differential testing and
   for corpora where a hot cluster would blow the matmul budget.
3. Duplicate groups = connected components of the pair graph
   (``components.connected_components`` with ``rebalance_edges=True``
   — the pairs arrive off a shuffle, so phase 1's per-partition
   union-find must not inherit a skewed layout). One kept
   representative per group: ``keep="min_id"`` (deterministic,
   oracle-checkable in SQL) or ``keep="far_from_centroid"`` — the
   paper's rule: keep the member LEAST similar to its cluster
   centroid (the least prototypical example), ties to min id.

Reference parity: the reference repo (wojciechkarcz/wroclaw-bike-stats)
has no embedding operators — this family belongs to the
beyond-reference LLM-data-pipeline charter (SURVEY.md §6), sitting
beside MinHash/SimHash (lexical), span dedup (substring) and
hyperplane-LSH (uncclustered semantic) as the cluster-scoped semantic
route.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import scratch
from wroclaw_bike_stats_spark.operators.components import (
    DRIVER_EDGES_MAX,
    connected_components,
    keep_canonical,
)
from wroclaw_bike_stats_spark.operators.density_guard import (
    DEFAULT_MAX_PAIRS_PER_NODE,
    DEFAULT_PERCOLATION_FRAC,
    check_cluster_density,
    check_component_percolation,
    maybe_refuse_pair_density,
)
from wroclaw_bike_stats_spark.operators.similarity import (
    _cosine_verify,
    _make_cosine_udf,
    _vec_matrix,
    assign_to_centroids,
    ivf_assign,
    kmeans_refine,
)

__all__ = [
    "semdedup_assign",
    "semdedup_pairs",
    "semdedup_keep",
    "semdedup_stats",
]

#: One duplicate-cosine threshold shared by EVERY entry point (full
#: pairs, keep, and the incremental form) — the incremental contract
#: is "incremental pairs == full recompute restricted to the new
#: batch", which default-argument use would silently violate if the
#: defaults diverged.
#:
#: .. versionchanged:: round 8
#:    ``semdedup_incremental_pairs`` previously defaulted to 0.95;
#:    unifying on the shared constant loosened its default to 0.4.
#:    Callers that relied on the old implicit 0.95 must now pass
#:    ``threshold=0.95`` explicitly.
DEFAULT_THRESHOLD = 0.4


def semdedup_assign(
    corpus: DataFrame,
    num_clusters: int = 8,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assigned corpus) for the SemDeDup cluster stage.

    ``refine_iters=0`` keeps the deterministic sampled centroids (the
    k smallest ids — reproducible in SQL, used by the oracle gates);
    ``refine_iters>0`` Lloyd-refines them (better balance, no longer
    SQL-expressible — covered by contract tests instead)."""
    centroids, assigned = ivf_assign(
        corpus, num_centroids=num_clusters, id_col=id_col, vec_col=vec_col
    )
    if refine_iters > 0:
        centroids = kmeans_refine(
            corpus, centroids, iters=refine_iters, id_col=id_col, vec_col=vec_col
        )
        assigned = assign_to_centroids(corpus, centroids, id_col, vec_col)
    return centroids, assigned


#: block edge for the per-cluster Gram: a B×B similarity tile is
#: B²·8 bytes (4096 → 134 MB), so the QUADRATIC memory term stays
#: bounded even for a hot cluster the k-sizing contract missed — the
#: remaining per-task footprint is the cluster's vectors themselves
#: (c·dim·8, linear), which applyInPandas materializes regardless.
_GRAM_BLOCK = 4096


def _cluster_pairs_matmul(
    assigned: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    max_pairs_per_node: float | None = DEFAULT_MAX_PAIRS_PER_NODE,
    percolation_frac: float | None = DEFAULT_PERCOLATION_FRAC,
) -> DataFrame:
    """Upper-triangle cosine pairs ≥ threshold per cluster group, as
    BLOCKED Gram tiles (see _GRAM_BLOCK). Emits (id_a, id_b,
    cosine_sim) with id_a < id_b; cosine rounded to 6 dp BEFORE
    thresholding — the family-wide convention
    (`similarity._cosine_verify`) so every route and the DuckDB
    oracles agree at the boundary.

    Circuit breakers (``density_guard``, both in-task, zero extra
    jobs): ``max_pairs_per_node`` is the hard anti-quadratic cap —
    the task aborts tile by tile, before the full Gram is paid, once
    emitted pairs exceed the bound; ``percolation_frac`` is the
    shape-aware check — a giant sparse component (a τ below the
    space's duplicate boundary chaining the cluster together, the
    round-13 episode) refuses before the pair table is materialized
    and before connected-components walks it. ``None`` disables
    either."""
    import numpy as np

    id_type = assigned.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"
    B = _GRAM_BLOCK

    def emit(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cosine_sim": []}
            ).astype({"cosine_sim": "float64"})
        E = _vec_matrix(pdf[vec_col], np)
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            En = E / norms
        ids = pdf[id_col].to_numpy()
        out_a, out_b, out_s = [], [], []
        n_emitted = 0
        for i0 in range(0, n, B):
            for j0 in range(i0, n, B):
                Si = np.round(En[i0 : i0 + B] @ En[j0 : j0 + B].T, 6)
                if i0 == j0:
                    iu, ju = np.triu_indices(Si.shape[0], k=1)
                else:
                    iu, ju = np.indices(Si.shape).reshape(2, -1)
                # NaN (zero-norm vector) compares False -> never a
                # duplicate, matching _make_cosine_udf's NaN falling
                # the >= filter.
                hit = Si[iu, ju] >= threshold
                out_a.append(ids[i0 + iu[hit]])
                out_b.append(ids[j0 + ju[hit]])
                out_s.append(Si[iu[hit], ju[hit]])
                n_emitted += int(hit.sum())
                check_cluster_density(
                    n_emitted, n, max_pairs_per_node, "semdedup_pairs"
                )
        ia, ib = np.concatenate(out_a), np.concatenate(out_b)
        check_component_percolation(
            ia.tolist(), ib.tolist(), n, "semdedup_pairs", percolation_frac
        )
        return pd.DataFrame(
            {
                "id_a": ia,
                "id_b": ib,
                "cosine_sim": np.concatenate(out_s),
            }
        )

    return assigned.groupBy("centroid_id").applyInPandas(emit, out_schema)


def semdedup_pairs(
    corpus: DataFrame,
    num_clusters: int = 8,
    threshold: float = DEFAULT_THRESHOLD,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_method: str = "cluster_matmul",
    assigned: DataFrame | None = None,
    max_pairs_per_node: float | None = DEFAULT_MAX_PAIRS_PER_NODE,
    percolation_frac: float | None = DEFAULT_PERCOLATION_FRAC,
    preflight: bool = True,
) -> DataFrame:
    """All within-cluster (a<b) pairs with cosine ≥ threshold:
    (id_a, id_b, cosine_sim). Pass a precomputed ``assigned`` (from
    ``semdedup_assign``) to reuse the cluster stage across calls.

    ``preflight`` (default ON, r15): before ANY pair stage is
    scheduled, ``density_guard.maybe_refuse_pair_density`` runs two
    small jobs on the assignment (cluster sizes + a bounded sample)
    and refuses when the estimated pairs-per-node reaches the
    giant-component degree threshold — the τ=0.8-on-whitened-vectors
    percolation now dies here, not in the matmul tasks. Corpora under
    the estimator's node floor skip it; dense-but-honest corpora
    acknowledge with ``preflight=False``. Note this makes plan
    construction EAGER (two small jobs) for large corpora.

    ``max_pairs_per_node`` / ``percolation_frac``: the matmul route's
    in-task circuit breakers (see ``_cluster_pairs_matmul`` /
    ``density_guard``) — refuse in-task, pre-materialization, when a
    cluster emits near-quadratically or its pair graph percolates
    into a giant sparse component; ``None`` disables. The relational
    ``pair_method="join"`` differential route has no in-task breaker
    (its candidate table is already explicit) — the pre-flight is its
    only guard."""
    if assigned is None:
        _, assigned = semdedup_assign(
            corpus, num_clusters, refine_iters, id_col, vec_col
        )
        if preflight:
            # r15 (guide §5): with the pre-flight on, the assignment
            # built HERE (no caller holds it) is consumed by the
            # pre-flight's two bounded jobs AND the pair stage —
            # un-persisted, each consumer re-runs the full
            # scan+assignment matmul. Scratch-persist so the chain
            # runs once; ``scratch.release()`` (via the engine's
            # ``release_shared``) frees it. Caller-provided
            # assignments keep the caller's persistence policy.
            assigned = scratch.persist(assigned)
    if preflight:
        maybe_refuse_pair_density(
            assigned, threshold, id_col=id_col, vec_col=vec_col,
            context="semdedup_pairs.preflight",
        )
    if pair_method == "cluster_matmul":
        return _cluster_pairs_matmul(
            assigned,
            threshold,
            id_col,
            vec_col,
            max_pairs_per_node,
            percolation_frac,
        )
    if pair_method == "join":
        a = assigned.select(F.col(id_col).alias("id_a"), "centroid_id")
        b = assigned.select(F.col(id_col).alias("id_b"), "centroid_id")
        cands = a.join(b, "centroid_id").filter(
            F.col("id_a") < F.col("id_b")
        ).select("id_a", "id_b")
        return _cosine_verify(cands, corpus, threshold, id_col, vec_col)
    raise ValueError(f"unknown pair_method {pair_method!r}")


def semdedup_keep(
    corpus: DataFrame,
    num_clusters: int = 8,
    threshold: float = DEFAULT_THRESHOLD,
    refine_iters: int = 0,
    keep: str = "min_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_method: str = "cluster_matmul",
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
    pairs: DataFrame | None = None,
    max_pairs_per_node: float | None = DEFAULT_MAX_PAIRS_PER_NODE,
    percolation_frac: float | None = DEFAULT_PERCOLATION_FRAC,
    preflight: bool = True,
) -> DataFrame:
    """SemDeDup closure: the corpus with every duplicate group
    collapsed to one representative (rows absent from the pair graph
    are singletons and kept).

    ``keep="min_id"``: representative = smallest id (deterministic,
    mirrors ``components.keep_canonical`` and the SQL oracles).
    ``keep="far_from_centroid"``: the paper's rule — representative =
    the group member with the LOWEST cosine to its cluster centroid,
    ties to min id.

    ``centroids``/``assigned``/``pairs`` accept precomputed stages
    (the ``semdedup_pairs(assigned=...)`` hook generalized): a caller
    holding persisted intermediates — the driver gates share one pair
    graph across three queries — skips recomputing them; any missing
    piece is built here. ``keep="min_id"`` with ``pairs`` touches no
    assignment at all."""
    need_assign = pairs is None or keep == "far_from_centroid"
    built_assigned = False
    if need_assign and (centroids is None or assigned is None):
        centroids, assigned = semdedup_assign(
            corpus, num_clusters, refine_iters, id_col, vec_col
        )
        built_assigned = True
    if pairs is None:
        # r15 (guide §1.2/§5): run the pre-flight HERE, not inside
        # semdedup_pairs, so its density estimate can also route the
        # pair graph: a graph the estimator bounds under
        # ``DRIVER_EDGES_MAX`` is scratch-persisted, which lets
        # ``connected_components`` resolve it with one bounded collect
        # + driver union-find (the persisted-small-edges fast path)
        # instead of ~10 scheduler barriers of two-phase machinery.
        # An estimated-large graph (or an acknowledged-dense
        # ``preflight=False`` corpus) is NOT persisted — the two-phase
        # route consumes the edge list exactly once, so storing it
        # would be pure overhead at scale. Same refusal semantics:
        # the estimate raises before any pair stage is scheduled.
        small_graph = False
        if preflight:
            if built_assigned:
                # the pre-flight's two jobs + the pair matmul each
                # consume the assignment — materialize it once
                assigned = scratch.persist(assigned)
            est = maybe_refuse_pair_density(
                assigned, threshold, id_col=id_col, vec_col=vec_col,
                context="semdedup_keep.preflight",
            )
            small_graph = est is None or (
                est["est_pairs"] <= DRIVER_EDGES_MAX
            )
        pairs = semdedup_pairs(
            corpus,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            pair_method=pair_method,
            assigned=assigned,
            max_pairs_per_node=max_pairs_per_node,
            percolation_frac=percolation_frac,
            preflight=False,
        )
        if small_graph:
            pairs = scratch.persist(pairs)
    comps = connected_components(
        pairs, src="id_a", dst="id_b", rebalance_edges=True
    )
    if keep == "min_id":
        return keep_canonical(corpus, comps=comps, id_col=id_col)
    if keep != "far_from_centroid":
        raise ValueError(f"unknown keep {keep!r}")
    # Paper rule: per component, keep the least-prototypical member.
    # centroid cosine is recomputed via a k-row broadcast equi-join on
    # centroid_id (assign_to_centroids returns the id only — keeping
    # its zero-Exchange plan for the common path).
    sim = _make_cosine_udf()(F.col(vec_col), F.col("centroid_vec"))
    csim = (
        assigned.join(F.broadcast(centroids), "centroid_id")
        .select(F.col(id_col).alias("node"), F.round(sim, 6).alias("c_sim"))
    )
    keepers = (
        comps.join(csim, "node")
        .groupBy("component_id")
        .agg(F.min_by("node", F.struct("c_sim", "node")).alias("keep_id"))
    )
    drops = (
        comps.join(keepers, "component_id")
        .filter(F.col("node") != F.col("keep_id"))
        .select(F.col("node").alias(id_col))
    )
    return corpus.join(drops, id_col, "left_anti")


def semdedup_incremental_pairs(
    new: DataFrame,
    old_assigned: DataFrame,
    centroids: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    old_vectors: DataFrame | None = None,
    pair_method: str = "cluster_matmul",
    new_assigned: DataFrame | None = None,
    max_pairs_per_node: float | None = DEFAULT_MAX_PAIRS_PER_NODE,
    percolation_frac: float | None = DEFAULT_PERCOLATION_FRAC,
) -> DataFrame:
    """Day-N incremental SemDeDup: duplicate pairs INVOLVING at least
    one NEW vector (new↔new and new↔old; old↔old was resolved when the
    resident corpus was deduped) — the per-ingest cost is ∝ |new| ×
    cluster size, never corpus².

    Standing assets (built once, read per ingest — the family pattern
    of the stored MinHash band / span-window / IVF index tables):
    ``old_assigned`` = the resident corpus's (id, vec, centroid_id)
    assignment table, ``centroids`` = the centroid frame it was
    assigned with. New vectors are assigned to the SAME centroids
    (zero-Exchange matmul), so a new vector lands exactly in the
    cluster its duplicates live in — with centroids held fixed, the
    incremental pair set EQUALS the full recompute's pairs restricted
    to pairs touching the new batch (an equality contract, not a
    recall bound; tests + the driver gate pin it).

    Default route (``pair_method="cluster_matmul"``): one
    ``applyInPandas`` per new-touching cluster computes the
    RECTANGULAR (new × members) cosine block with tiled matmuls —
    the same vectorization as the full path, so the increment's cost
    is |new|·c̄ multiply-adds, not |new|·c̄ interpreted pair rows
    (the r07 first-cut relational route — kept as
    ``pair_method="join"`` for differential testing — built the
    candidate PAIR TABLE through a join + per-row cosine UDF and
    measured SLOWER than the full Gram recompute at sf10: the full
    path's matmul beat it per pair ~50×).
    ``old_vectors`` defaults to ``old_assigned`` itself (it carries
    the vectors); pass the raw corpus frame if your stored assignment
    table was thinned to ids. ``new_assigned``: the batch's own
    ``assign_to_centroids(new, centroids)`` frame, precomputed — pass
    it when the caller also appends it to the standing assignment
    store (the streaming ingest does), so the batch is assigned ONCE
    per ingest. MUST be the assignment of exactly ``new`` under
    exactly ``centroids``; anything else silently misplaces pairs."""
    import numpy as np

    if new_assigned is None:
        new_assigned = assign_to_centroids(new, centroids, id_col, vec_col)
    if pair_method == "join":
        members = old_assigned.select(
            F.col(id_col).alias("_mid"), "centroid_id"
        ).unionByName(
            new_assigned.select(F.col(id_col).alias("_mid"), "centroid_id")
        )
        na = new_assigned.select(F.col(id_col).alias("_nid"), "centroid_id")
        cands = (
            F.broadcast(na)
            .join(members, "centroid_id")
            .filter(F.col("_nid") != F.col("_mid"))
            .select(
                F.least("_nid", "_mid").alias("id_a"),
                F.greatest("_nid", "_mid").alias("id_b"),
            )
            .distinct()
        )
        vectors = old_vectors if old_vectors is not None else old_assigned
        corpus = vectors.select(id_col, vec_col).unionByName(
            new.select(id_col, vec_col)
        )
        return _cosine_verify(
            cands, corpus, threshold, id_col, vec_col, prune_corpus=True
        )
    if pair_method != "cluster_matmul":
        raise ValueError(f"unknown pair_method {pair_method!r}")

    if old_vectors is not None:
        old_src = old_assigned.select(id_col, "centroid_id").join(
            old_vectors.select(id_col, vec_col), id_col
        )
    else:
        old_src = old_assigned
    tagged = old_src.select(
        id_col, vec_col, "centroid_id", F.lit(False).alias("_is_new")
    ).unionByName(
        new_assigned.select(
            id_col, vec_col, "centroid_id", F.lit(True).alias("_is_new")
        )
    )
    # only clusters the new batch touches do any work (tiny distinct)
    new_cids = new_assigned.select("centroid_id").distinct()
    tagged = tagged.join(F.broadcast(new_cids), "centroid_id", "left_semi")

    id_type = tagged.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"
    B = _GRAM_BLOCK

    def emit(pdf):
        import pandas as pd

        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "cosine_sim": []}
        ).astype({"cosine_sim": "float64"})
        pdf = pdf.sort_values(id_col)
        is_new = pdf["_is_new"].to_numpy(dtype=bool)
        n = len(pdf)
        if n < 2 or not is_new.any():
            return empty
        E = _vec_matrix(pdf[vec_col], np)
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            En = E / norms
        ids = pdf[id_col].to_numpy()
        En_new, ids_new = En[is_new], ids[is_new]
        out_a, out_b, out_s = [], [], []
        n_emitted = 0
        for i0 in range(0, len(ids_new), B):
            ri = ids_new[i0 : i0 + B]
            for j0 in range(0, n, B):
                S = np.round(En_new[i0 : i0 + B] @ En[j0 : j0 + B].T, 6)
                cj = ids[j0 : j0 + B]
                nj = is_new[j0 : j0 + B]
                # keep: above threshold, not self, and a new↔new pair
                # only from its smaller-id row (the other direction
                # re-emits it)
                keep = (
                    (S >= threshold)
                    & (cj[None, :] != ri[:, None])
                    & ~(nj[None, :] & (cj[None, :] < ri[:, None]))
                )
                iu, ju = np.nonzero(keep)
                a, b = ri[iu], cj[ju]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
                out_s.append(S[iu, ju])
                n_emitted += len(iu)
                check_cluster_density(
                    n_emitted,
                    n,
                    max_pairs_per_node,
                    "semdedup_incremental_pairs",
                )
        if not out_a:
            return empty
        ia, ib = np.concatenate(out_a), np.concatenate(out_b)
        # this emitter omits old-old edges by design, so a true
        # duplicate clique with a small new batch is SPARSE against
        # C(k,2); normalize by the emittable count instead (new_ids).
        check_component_percolation(
            ia.tolist(),
            ib.tolist(),
            n,
            "semdedup_incremental_pairs",
            percolation_frac,
            new_ids=set(ids_new.tolist()),
        )
        return pd.DataFrame(
            {
                "id_a": ia,
                "id_b": ib,
                "cosine_sim": np.concatenate(out_s),
            }
        )

    return tagged.groupBy("centroid_id").applyInPandas(emit, out_schema)


def semdedup_stats(
    corpus: DataFrame,
    num_clusters: int = 8,
    threshold: float = DEFAULT_THRESHOLD,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Per-cluster SemDeDup profile: (centroid_id, n_vectors,
    n_dup_pairs) — the operational view that tells an operator whether
    ``num_clusters`` is keeping cluster sizes (and so the per-task
    Gram cost) bounded. Both ends of a pair share a cluster, so the
    pair→cluster attribution joins on id_a only. ``assigned``/``pairs``
    accept precomputed stages (the ``semdedup_keep`` hook)."""
    if assigned is None:
        _, assigned = semdedup_assign(
            corpus, num_clusters, refine_iters, id_col, vec_col
        )
    if pairs is None:
        pairs = semdedup_pairs(
            corpus, threshold=threshold, id_col=id_col, vec_col=vec_col,
            assigned=assigned,
        )
    sizes = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    per_cluster = (
        pairs.join(
            assigned.select(F.col(id_col).alias("id_a"), "centroid_id"), "id_a"
        )
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )
    return (
        sizes.join(per_cluster, "centroid_id", "left")
        .select(
            "centroid_id",
            "n_vectors",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
        )
    )
