"""Similarity search over embedding columns (``array<float>``).

Two paths:

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small)
  query set against the corpus; dot products are native
  ``zip_with``/``aggregate`` expressions (JVM, codegen) — no UDF, no
  shuffle of the corpus side. The scale baseline: at 100 TB the corpus
  scan is embarrassingly parallel and the per-row work is O(dim·|Q|).

- ``cosine_topk_ivf`` — IVF-style approximate path: k-means-ish
  coarse quantizer (centroids = deterministic sample), each vector
  assigned to its nearest centroid at index time; queries probe only
  the nearest ``nprobe`` centroid partitions. Turns full-corpus scans
  into cluster-pruned scans — the standard ANN trade at scale.

- ``embedding_neardup_pairs`` — near-duplicate detection: all pairs
  with cosine ≥ threshold, via block-nested broadcast when one side is
  small, or LSH-style random-hyperplane bucketing at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a, b):
    """Cosine similarity of two array<numeric> columns — native
    expression, computed in double precision."""
    a_d = F.transform(a, lambda x: x.cast("double"))
    b_d = F.transform(b, lambda x: x.cast("double"))
    return _dot(a_d, b_d) / (_norm(a_d) * _norm(b_d))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` is expected small (it is broadcast); the corpus side
    never shuffles — the only wide op is the final per-query top-k,
    which AQE executes as a TakeOrdered per partition + merge.
    Excludes self-matches (same id). Deterministic tie-break on
    (sim DESC, corpus id ASC).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index: centroids = deterministic sample of corpus
    vectors (ids ascending — reproducible without Math.random), each
    vector assigned to its nearest centroid by cosine.

    Returns (centroids, assigned corpus). At scale, write ``assigned``
    partitioned by ``centroid_id`` so probes prune at the file level.
    """
    centroids = F.broadcast(
        corpus.orderBy(id_col)
        .limit(num_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
        )
    )
    scored = corpus.crossJoin(centroids).select(
        F.col(id_col),
        F.col(vec_col),
        "centroid_id",
        cosine(F.col(vec_col), F.col("centroid_vec")).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("centroid_id"))
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )
    return centroids, assigned


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest centroid
    clusters per query. Same output schema as brute force; recall
    depends on (num_centroids, nprobe)."""
    centroids, assigned = ivf_assign(corpus, num_centroids, id_col, vec_col)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_probe = (
        q.crossJoin(centroids)
        .select(
            "query_id",
            "q_vec",
            "centroid_id",
            cosine(F.col("q_vec"), F.col("centroid_vec")).alias("_sim"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("_sim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )

    scored = (
        assigned.join(F.broadcast(q_probe), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("q_vec"), F.col(vec_col)), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a<b) pairs with cosine ≥ threshold.

    Local/small-corpus form is a self cross join (fine at test scale);
    the scale path buckets by random-hyperplane signs first — see
    ``hyperplane_buckets`` — making the join key-equi on bucket.
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def hyperplane_buckets(
    corpus: DataFrame,
    num_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (SimHash for
    cosine): bit i = sign(dot(v, h_i)) with h_i a deterministic
    pseudo-random hyperplane derived from xxhash64(i, dim index) —
    reproducible across runs with no RNG state.

    Near-identical vectors collide; candidate pairs come from a
    groupBy on bucket instead of a cross join.
    """
    dim = F.size(F.col(vec_col))
    planes = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.transform(
            F.sequence(F.lit(0), dim - 1),
            # hash → [-1, 1) pseudo-random component
            lambda d: (F.pmod(F.xxhash64(p, d), F.lit(2000)) - 1000.0) / 1000.0,
        ),
    )
    bucket = F.aggregate(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(
            _dot(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.element_at(planes, p + 1),
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), p),
        ).otherwise(F.lit(0).cast("long")),
    )
    return corpus.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))
