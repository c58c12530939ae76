"""Connected components over a similarity-pair graph, and the
canonical-keep dedup built on it.

The near-dup operators (``dedup.ngram_jaccard_pairs``,
``minhash_dedup_pairs``, ``simhash_neardup_pairs``,
``similarity.embedding_neardup_pairs``) emit PAIRS; a dedup pipeline
needs CLUSTERS and one kept representative per cluster. That closure
is a connected-components problem — solved here with a TWO-PHASE
scheme (default) built for the shape near-dup graphs actually have
(sparse, quasi-clique components with tiny diameters), with the plain
iterative hash-min label propagation kept as the ``method="hashmin"``
fallback and as the phase-2 engine over the contracted graph:

1. **Partition-local union-find** (``mapInPandas``): each edge
   partition collapses its subgraph with classic union-find
   (path compression, union-by-min-id) and emits ``(node,
   local_root)``. Every edge lives in exactly one partition, so every
   edge is FULLY resolved locally — after this pass the only
   unresolved links are nodes that appear in more than one partition
   (their several local roots must be the same component).
   One narrow pass, no shuffle; per-partition memory is O(nodes in
   the partition) — bounded by ``spark.sql.files.maxPartitionBytes``,
   never by graph size. This is the charter's sanctioned use of
   imperative per-partition logic: union-find has no efficient
   relational form, and the alternative (the r05 global fixpoint)
   held the FULL label set live across O(diameter) shuffle rounds —
   measured at the sf100 scaling point (2.5M-edge graph) as a 12-min
   GC-bound run; this scheme resolves ~all edges in phase 1 and runs
   the fixpoint on a boundary graph orders of magnitude smaller.

2. **Boundary contraction + fixpoint**: nodes with >1 distinct local
   root yield link edges between those roots (≤ appearances-1 links
   per boundary node — proportional to partition-crossing nodes, NOT
   to edges). The hash-min fixpoint then runs over this contracted
   graph only; its labels are the graph's local roots, a set that is
   orders of magnitude smaller than the node set for near-dup
   workloads.

3. **Re-expansion**: ``(node, local_root)`` joined to the contracted
   components (AQE picks broadcast when the boundary set is small —
   the common case) gives the final ``(node, component_id)`` with
   ``component_id`` = global min node id of the component, exactly
   the hash-min semantics (the global min is its own local root in
   every partition that sees it, so the contracted fixpoint's min is
   the true global min).

Scale design (100 TB corpus → billions of nodes):
- phase 1 is embarrassingly parallel and shuffle-free;
- the mapping (one row per (partition, node) appearance) moves
  through ONE shuffle (the boundary groupBy) — comparable to a
  single round of the old scheme, after which all remaining work is
  on the contracted graph;
- fixpoint rounds on the contracted graph keep the old guards:
  ``localCheckpoint`` lineage truncation per round and a ``limit(1)``
  convergence probe.

Not GraphX/GraphFrames: neither ships with a plain PySpark install,
and this formulation keeps the operator inside Catalyst/AQE like
everything else in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import scratch


def _hashmin_fixpoint(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Iterative hash-min label propagation: every round, each node's
    label becomes the min label in its closed neighborhood; at
    fixpoint each node carries the component's min node id. One
    shuffle per round; rounds = O(component diameter). Raises if
    ``max_iter`` rounds don't converge."""
    # Both union branches read `pairs` — persist it or the (possibly
    # expensive) upstream pair join runs twice.
    pairs = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    edges = pairs.union(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # Duplicate edges are harmless under min-aggregation; skipping
    # distinct() here saves a full shuffle of the edge list.
    edges = edges.persist()
    # Touch the cached frames once so their buffer RDDs REGISTER now:
    # a cache registers at first use, and if that first use happened
    # inside the checkpoint below, checkpoint_tracked's id diff would
    # mis-attribute the cache ids to the checkpoint and release the
    # edge cache mid-iteration.
    edges.limit(1).count()

    spark = pairs.sparkSession
    labels, labels_ids = scratch.checkpoint_tracked(
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        nbr = edges.join(
            labels.select(F.col("node").alias("u"), "comp"), "u"
        ).select(F.col("v").alias("node"), "comp")
        new, new_ids = scratch.checkpoint_tracked(
            labels.union(nbr)  # closed neighborhood: own label included
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        # `new` is eagerly materialized and `changed` consumed the old
        # labels — the old round's checkpoint BLOCKS are now dead.
        # DataFrame.unpersist is a no-op for checkpoints, so release
        # at the RDD level via the tracked ids.
        scratch.release_rdd_ids(spark, labels_ids)
        labels, labels_ids = new, new_ids
        if changed == 0:
            edges.unpersist()
            pairs.unpersist()
            # The final checkpoint backs the returned frame (lineage is
            # cut, so its blocks must NOT be force-released while any
            # consumer might still run); ContextCleaner reclaims it
            # once the caller drops the reference.
            return labels.select("node", F.col("comp").alias("component_id"))
    edges.unpersist()
    pairs.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds max_iter"
    )


#: Bound on the number of contracted boundary-graph edges resolved
#: with DRIVER-side union-find instead of the distributed hash-min
#: fixpoint (r15 optimization, guide §1.2/§2.4). The contracted graph
#: is ALREADY the output of the two-phase scheme's quadratic
#: reduction — one row per (boundary root, boundary root) link,
#: orders of magnitude smaller than the edge list — so up to this
#: many rows (2 ids each; ~200k rows ≈ a few MB) the final resolve is
#: a bounded small-result collect (the engine's standing pattern for
#: ≤k centroid lists / per-day metric rows), replacing O(diameter)
#: fixpoint rounds — each round = a join + groupBy + checkpoint +
#: convergence probe, ~6 scheduler barriers — with ZERO distributed
#: rounds. Measured at the bench sf: connected_components drops from
#: ~40 jobs to ~5. Graphs whose boundary exceeds the bound take the
#: unchanged fixpoint route; the bound is on the CONTRACTED graph, so
#: this is not a "fits-in-driver" assumption about the corpus.
DRIVER_LINKS_MAX = 200_000

#: Bound on the number of RAW edges resolved driver-side when the
#: pair frame is already persisted (the whole-graph fast path below).
#: Deliberately much smaller than ``DRIVER_LINKS_MAX``: the result
#: comes back as a plan-embedded LocalRelation, which is only a win
#: while it stays broadcast-trivial — measured at the bench sf, a
#: multi-hundred-k-row LocalRelation cached by the shared-CC gates
#: inflated every consumer's plan (single-task 2 s scan stages) and
#: made the banded gate 4× slower, while a few-hundred-row one cut
#: semdedup_keep 2.6×. 10k edges → ≤20k nodes ≈ ~320 KB.
DRIVER_EDGES_MAX = 10_000


def _storage_backed(df: DataFrame) -> bool:
    """True when the frame was ``persist()``-ed (any storage level
    that holds blocks) — i.e. a bounded ``limit`` probe on it reads
    (or fills) cache blocks instead of scheduling an unbounded
    recomputation of an expensive upstream (a shuffle-fed pair join's
    map stages would otherwise run just for the probe). Zero jobs —
    a driver-side property check only."""
    try:
        sl = df.storageLevel
        return bool(sl.useMemory or sl.useDisk)
    except Exception:  # noqa: BLE001 - conservative: no fast path
        return False


def _driver_union_find(rows) -> dict:
    """Union-find (union-by-min + path compression) over collected
    (r0, r) link rows — the exact hash-min semantics (component label
    = min member id) computed in one pass on the driver. Returns
    {node: component_min} for every node in the rows."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {x: find(x) for x in parent}


def _local_union_find(pairs: DataFrame) -> DataFrame:
    """Phase 1: per-partition union-find over the edge list.

    Emits one ``(node, root)`` row per (partition, node) appearance;
    ``root`` is the MIN node id of the node's component within that
    partition (union-by-min + full path compression keeps the
    representative the minimum seen, so re-expansion stays
    deterministic). Narrow — mapInPandas preserves partitioning."""
    import pandas as pd

    t = pairs.schema["u"].dataType.simpleString()

    def part_uf(batches):
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
                if u not in parent:
                    parent[u] = u
                if v not in parent:
                    parent[v] = v
                ru, rv = find(u), find(v)
                if ru != rv:
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
        nodes = list(parent)
        # chunked emission: one partition can hold millions of nodes;
        # Arrow slices them out without one giant frame allocation
        for i in range(0, len(nodes), 1 << 20):
            chunk = nodes[i : i + (1 << 20)]
            yield pd.DataFrame(
                {"node": chunk, "root": [find(x) for x in chunk]}
            )

    return pairs.mapInPandas(part_uf, schema=f"node {t}, root {t}")


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    method: str = "twophase",
    rebalance_edges: bool = False,
    driver_links_max: int | None = DRIVER_LINKS_MAX,
) -> DataFrame:
    """Resolve an undirected pair graph to ``(node, component_id)``
    where ``component_id`` is the minimum node id in the component.

    Only nodes that appear in ``pairs`` are returned — callers decide
    whether absent nodes are singletons (see ``keep_canonical``).

    ``method="twophase"`` (default): partition-local union-find, then
    the hash-min fixpoint over the contracted boundary graph only —
    see the module docstring for why this is the extreme-scale shape.
    ``method="hashmin"``: the plain global fixpoint (one shuffle of
    the FULL edge list per round) — kept for differential testing and
    for callers that need its strict round-count semantics.

    ``driver_links_max`` (r15): under ``twophase``, a contracted
    boundary graph of at most this many link rows is resolved with
    union-find ON THE DRIVER (one bounded collect — a few MB at the
    default bound — instead of O(diameter) fixpoint rounds each
    costing a join + groupBy + checkpoint + convergence probe).
    Identical output: union-by-min union-find and hash-min both label
    a component with its minimum member id. ``None``/0 disables;
    larger boundary graphs use the distributed fixpoint unchanged.
    Additionally, when ``pairs`` is itself persisted (shared/scratch
    pair graphs) and the FULL edge list fits the smaller
    ``DRIVER_EDGES_MAX`` bound, the whole graph is resolved
    driver-side from one bounded collect and returned as a
    LocalRelation — no phase-1 pass, no boundary shuffle, no
    checkpoint (same labels by the same argument). The probe is gated
    on the persist so it can never trigger an unbounded recomputation
    of an un-materialized pair join, and the tighter bound keeps the
    plan-embedded result broadcast-trivial (see ``DRIVER_EDGES_MAX``).

    ``max_iter`` bounds the fixpoint rounds (over the contracted
    graph under ``twophase``); exceeding it raises rather than
    returning wrong components. Under ``twophase`` the contracted
    diameter is ≤ the raw diameter (usually far smaller — a path
    that fits one partition contracts to a point), so convergence is
    at least as fast as ``hashmin`` for the same bound.

    Phase 1's Python union-find dict holds every node in its
    partition (~100 B/entry) — bounded by
    ``spark.sql.files.maxPartitionBytes`` when ``pairs`` comes off a
    file scan, but NOT when it arrives straight from a skewed
    pair-generation shuffle (a hot shingle/band can pile far more
    edges into one partition). For shuffle-fed graphs pass
    ``rebalance_edges=True`` — one round-robin repartition to the
    session shuffle parallelism evens the edge list out before the
    local pass (phase 1 is partition-arbitrary, so correctness is
    unaffected; only the contraction quality shifts) — or use
    ``method="hashmin"``, whose per-round state is cluster-wide.
    """
    if method == "hashmin":
        return _hashmin_fixpoint(pairs, src, dst, max_iter)
    if method != "twophase":
        raise ValueError(f"unknown method {method!r}")

    edges = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))

    # r15 (extension of the contracted-graph driver resolve): when the
    # EDGE LIST itself is already materialized (persisted pair frames —
    # the engine's shared/scratch pair graphs) AND fits the same
    # ``driver_links_max`` bound, resolve the whole graph with one
    # bounded collect + driver union-find and return a LocalRelation.
    # This skips phase 1 entirely — the mapInPandas pass, its persist/
    # unpersist lifecycle, the boundary groupBy and the checkpoint are
    # ~10 scheduler barriers that dominate CC cost on small graphs
    # (the semdedup gate's 262-pair graph paid ~1.5 s of pure barrier
    # latency per call). Gated on ``_storage_backed`` so the probe can
    # never schedule an unbounded recomputation of an un-persisted
    # shuffle-fed pair join at scale, and on ``DRIVER_EDGES_MAX`` so
    # the LocalRelation result stays broadcast-trivial; larger or
    # non-materialized edge lists take the unchanged two-phase route.
    edge_bound = min(driver_links_max or 0, DRIVER_EDGES_MAX)
    if edge_bound and _storage_backed(pairs):
        head = edges.limit(edge_bound + 1).collect()
        if len(head) <= edge_bound:
            import pandas as pd

            comp = _driver_union_find((r["u"], r["v"]) for r in head)
            t = edges.schema["u"].dataType.simpleString()
            # via pandas: the Arrow path plans a LocalRelation (no
            # parallelize job; AQE broadcasts it in downstream joins)
            pdf = pd.DataFrame(
                {"node": list(comp), "component_id": list(comp.values())}
            )
            return pairs.sparkSession.createDataFrame(
                pdf, schema=f"node {t}, component_id {t}"
            )

    if rebalance_edges:
        edges = edges.repartition(
            int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        )
    # mapping feeds the boundary groupBy AND the final re-expansion
    # join — persist so phase 1 (and the upstream pair join) runs once.
    # Released below once the final result is checkpointed; callers
    # get a MATERIALIZED frame (same contract as the hashmin route's
    # checkpointed labels) they can cache/reuse freely.
    mapping = _local_union_find(edges).persist()

    # Boundary links: a node seen in >1 partition with differing local
    # roots links those roots. min(root) as the hub keeps links-per-
    # node linear (star, not clique, over its roots).
    # links is consumed up to three times (the emptiness probe, then
    # the fixpoint's own persist pass) — persist so the boundary
    # aggregation over the full mapping runs once, not per consumer.
    links = (
        mapping.groupBy("node")
        .agg(
            F.min("root").alias("r0"),
            F.collect_set("root").alias("roots"),
        )
        .filter(F.size("roots") > 1)
        .select("r0", F.explode("roots").alias("r"))
        .filter(F.col("r") != F.col("r0"))
    ).persist()

    # try/finally: checkpoint_tracked materializes the result eagerly,
    # so the caches are dead weight the moment we return — and must
    # not leak for the session lifetime if the fixpoint raises
    # (max_iter non-convergence) and a resident caller catches it.
    try:
        # r15: resolve the CONTRACTED graph on the driver when it is
        # small (the common near-dup shape — see DRIVER_LINKS_MAX).
        # One bounded collect replaces both the emptiness probe and
        # the whole fixpoint; oversized boundary graphs fall through
        # to the unchanged distributed fixpoint.
        head = None
        if driver_links_max:
            head = links.limit(driver_links_max + 1).collect()
            if len(head) > driver_links_max:
                head = None
        if (head == [] if head is not None
                else links.limit(1).count() == 0):
            # every component resolved within a single partition
            result = mapping.groupBy("node").agg(
                F.min("root").alias("component_id")
            )
            final, _ids = scratch.checkpoint_tracked(result)
            return final

        if head is not None:
            spark = pairs.sparkSession
            comp = _driver_union_find((r["r0"], r["r"]) for r in head)
            t = links.schema["r0"].dataType.simpleString()
            # only non-self entries: re-expansion coalesces a missing
            # root to itself, the same contract as the fixpoint route
            root_comp = F.broadcast(
                spark.createDataFrame(
                    [(x, c) for x, c in comp.items() if x != c],
                    schema=f"root {t}, _rc {t}",
                )
            )
        else:
            root_comp = _hashmin_fixpoint(links, "r0", "r", max_iter).select(
                F.col("node").alias("root"),
                F.col("component_id").alias("_rc"),
            )
        # Re-expansion: roots absent from the boundary graph keep
        # themselves; boundary roots take the contracted component's
        # min. AQE broadcasts root_comp when the boundary set is small
        # (the common case); no forced hint — heavy-dup graphs can
        # have a large boundary.
        result = (
            mapping.join(root_comp, "root", "left")
            .select(
                "node",
                F.coalesce(F.col("_rc"), F.col("root")).alias("comp"),
            )
            .groupBy("node")
            .agg(F.min("comp").alias("component_id"))
        )
        # checkpoint = eager materialization + lineage cut: repeat
        # consumers (the shared-CC gates) read blocks, not plans. The
        # blocks themselves go to ContextCleaner when the caller drops
        # the frame.
        final, _ids = scratch.checkpoint_tracked(result)
        return final
    finally:
        links.unpersist()
        mapping.unpersist()


def keep_canonical(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    comps: DataFrame | None = None,
) -> DataFrame:
    """Near-dup dedup closure: keep every row whose id is NOT a
    non-canonical member of some component (the kept representative is
    the min id; rows absent from the pair graph are singletons and
    kept). Anti-join against the non-canonical set; AQE picks
    broadcast vs shuffle by its actual size (it can be a large
    fraction of the corpus when duplication is heavy — don't force a
    broadcast).

    Provide EITHER ``pairs`` (the components run here) OR a
    precomputed ``comps`` (a ``connected_components`` result — reuse
    costs nothing); ``src``/``dst``/``max_iter`` apply only to the
    ``pairs`` route."""
    if (pairs is None) == (comps is None):
        raise ValueError("provide exactly one of `pairs` or `comps`")
    if comps is None:
        comps = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    dupes = comps.filter(F.col("node") != F.col("component_id")).select(
        F.col("node").alias(id_col)
    )
    return df.join(dupes, id_col, "left_anti")
