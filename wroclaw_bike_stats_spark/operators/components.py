"""Connected components over a similarity-pair graph, and the
canonical-keep dedup built on it.

The near-dup operators (``dedup.ngram_jaccard_pairs``,
``minhash_dedup_pairs``, ``simhash_neardup_pairs``,
``similarity.embedding_neardup_pairs``) emit PAIRS; a dedup pipeline
needs CLUSTERS and one kept representative per cluster. That closure
is a connected-components problem — this module solves it with
iterative hash-min label propagation expressed as DataFrame ops:
every round, each node's label becomes the minimum label in its
closed neighborhood; at fixpoint, each node carries the minimum node
id of its component (the deterministic canonical representative).

Scale design (100 TB corpus → billions of nodes, but near-dup graphs
are sparse and their components are quasi-cliques with tiny
diameters):

- one round = one shuffle (edges ⋈ labels, then groupBy-min keyed by
  node) — no driver-side graph, no collect;
- rounds needed = O(component diameter): 2–4 in practice for near-dup
  clusters, ``max_iter`` bounds pathological chains;
- ``localCheckpoint`` after every round truncates lineage — without
  it the plan doubles per iteration and the optimizer, not the data,
  becomes the bottleneck (the classic iterative-Spark failure);
- the convergence probe is ``limit(1)`` over changed labels — it
  short-circuits instead of counting every change.

Not GraphX/GraphFrames: neither ships with a plain PySpark install,
and the DataFrame formulation keeps the operator inside Catalyst/AQE
like everything else in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import scratch


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Resolve an undirected pair graph to ``(node, component_id)``
    where ``component_id`` is the minimum node id in the component.

    Only nodes that appear in ``pairs`` are returned — callers decide
    whether absent nodes are singletons (see ``keep_canonical``).
    Raises if ``max_iter`` rounds don't reach the fixpoint (a diameter
    larger than ``max_iter`` means the input isn't a near-dup graph —
    fail loudly rather than return wrong components).
    """
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

    Provide EITHER ``pairs`` (the fixpoint runs here) OR a precomputed
    ``comps`` (a ``connected_components`` result — its checkpoints are
    already materialized, so reuse costs nothing); ``src``/``dst``/
    ``max_iter`` apply only to the ``pairs`` route."""
    if (pairs is None) == (comps is None):
        raise ValueError("provide exactly one of `pairs` or `comps`")
    if comps is None:
        comps = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    dupes = comps.filter(F.col("node") != F.col("component_id")).select(
        F.col("node").alias(id_col)
    )
    return df.join(dupes, id_col, "left_anti")
