"""DSIR-style importance resampling — select raw-corpus documents
whose hashed n-gram feature distribution resembles a TARGET corpus
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023). The published recipe: featurize every doc
as hashed unigram+bigram counts over B buckets, fit two bucket
categorical distributions (target p, raw q), weight each raw doc by
log w = Σ_b cnt_b·(ln p_b − ln q_b), then sample without replacement
with probability ∝ w via the Gumbel top-k trick. This is the data
selection step Pile-of-Law/RedPajama-class pipelines run between raw
crawl dedup and training-mix assembly.

Spark-first shape (everything lazy, one corpus-shuffle per pass):

- **Featurization** is a narrow explode: tokens + adjacent-pair
  bigrams → bucket id, all codegen (``md5``/``conv`` or ``xxhash64``
  — see ``portable_hash``). No per-doc Python, no vocabulary build:
  the hash IS the vocabulary, which is what makes the method run at
  corpus scale (the paper's point).
- **Distributions** are two ``groupBy(bucket)`` counts with map-side
  partial combine — B (default 4096) rows each; totals ride as lazy
  1-row cross-joined aggregates so fitting composes into one plan
  with zero eager jobs.
- **Scoring** broadcast-joins the B-row log-ratio table to the
  exploded gram stream and sums per doc: ONE shuffle keyed by doc
  id. q is fit on the SCORED corpus itself (the paper's estimator),
  so no holdout bookkeeping.
- **Resampling** adds deterministic Gumbel noise derived from the
  doc id via the repo's portable multiplicative hash (the same
  arithmetic ``hash_split_assign`` uses) — reproducible sampling,
  exact oracle parity — and takes the global top-k with the
  deterministic two-stage pattern (per-partition prune under AQE,
  then one tiny final sort).

``portable_hash=True`` buckets with the first 8 hex chars of md5 —
bit-identical in DuckDB (the driver oracle uses it); the default
``xxhash64`` route is the cheaper production choice. Both are tagged
into the log-ratio table's column metadata so scoring against a
stored table built under the other scheme fails loud.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators.pipeline import hash_bucket
from wroclaw_bike_stats_spark.operators.text import tokens

#: 2^32 — the modulus of the portable multiplicative hash
#: (pipeline.hash_bucket). Gumbel noise derives u from that hash so
#: the arithmetic is identical to hash_split_assign's and exactly
#: reproducible in ANSI SQL (DuckDB's HUGEINT full-width product is
#: congruent mod 2^32 with the overflow-safe split multiply).
_M32 = 4294967296


def _grams(col: Column) -> Column:
    """Unigrams + adjacent-pair bigrams as one ``array<string>`` —
    the paper's hashed feature set. Bigrams join with a single space
    (whitespace tokens make that injective). NULL text coalesces to
    empty (one empty-token unigram) so every doc yields grams and a
    score row — the same NULL contract as the span-dedup family and
    the DuckDB oracles' ``coalesce(text, '')``."""
    toks = tokens(F.coalesce(col, F.lit("")))
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bi)


def _bucket(gram: Column, num_buckets: int, portable_hash: bool) -> Column:
    if portable_hash:
        return (
            F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
            % num_buckets
        )
    return F.pmod(F.xxhash64(gram), F.lit(num_buckets))


def _scheme(num_buckets: int, portable_hash: bool) -> str:
    return f"{'md5prefix' if portable_hash else 'xxhash64'}-{num_buckets}"


def hashed_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    num_buckets: int = 4096,
    portable_hash: bool = False,
) -> DataFrame:
    """Corpus-level hashed-feature distribution: (``bucket``,
    ``cnt``) over occupied buckets. One explode + one keyed
    aggregation with map-side combine — B rows out regardless of
    corpus size."""
    return (
        df.select(F.explode(_grams(F.col(text_col))).alias("_g"))
        .select(_bucket(F.col("_g"), num_buckets, portable_hash).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_logratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_buckets: int = 4096,
    alpha: float = 0.5,
    portable_hash: bool = False,
) -> DataFrame:
    """The fitted importance model: (``bucket``, ``logratio``) over
    the FULL bucket domain [0, B), where logratio = ln p̂ − ln q̂
    with add-α smoothed bucket probabilities
    p̂_b = (cnt_b + α) / (total + α·B). B rows — store it as
    parquet and it is the standing selection asset (provenance in
    column metadata; ``dsir_scores`` validates it)."""
    tgt = hashed_bucket_counts(target, text_col, num_buckets, portable_hash)
    rw = hashed_bucket_counts(raw, text_col, num_buckets, portable_hash)
    domain = target.sparkSession.range(num_buckets).select(
        F.col("id").alias("bucket")
    )
    t_tot = tgt.agg(F.sum("cnt").alias("_tt"))
    r_tot = rw.agg(F.sum("cnt").alias("_rt"))
    ab = alpha * num_buckets
    logratio = (
        F.log(
            (F.coalesce("_tc", F.lit(0)) + alpha)
            / (F.coalesce("_tt", F.lit(0)) + ab)
        )
        - F.log(
            (F.coalesce("_rc", F.lit(0)) + alpha)
            / (F.coalesce("_rt", F.lit(0)) + ab)
        )
    )
    return (
        domain.join(
            F.broadcast(tgt.withColumnRenamed("cnt", "_tc")), "bucket", "left"
        )
        .join(
            F.broadcast(rw.withColumnRenamed("cnt", "_rc")), "bucket", "left"
        )
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            logratio.alias(
                "logratio",
                metadata={"dsir_scheme": _scheme(num_buckets, portable_hash)},
            ),
        )
    )


def _check_model(model: DataFrame, num_buckets: int, portable_hash: bool):
    meta = (
        model.schema["logratio"].metadata
        if "logratio" in model.columns
        else {}
    )
    stored = meta.get("dsir_scheme")
    want = _scheme(num_buckets, portable_hash)
    if stored is not None and stored != want:
        raise ValueError(
            f"stored DSIR model was fit under scheme {stored!r} but this "
            f"run buckets with {want!r} — scores would be garbage; refit "
            "or pass matching num_buckets/portable_hash"
        )


def dsir_scores(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    portable_hash: bool = False,
) -> DataFrame:
    """Per-document importance log-weight under a fitted model:
    (``id_col``, ``n_grams``, ``logw``), logw rounded to 4 dp (the
    repo's float-gate convention). Docs whose text yields no grams
    (empty/NULL) still score: their single empty-token gram hashes
    like any other. Shape: explode → broadcast model join → ONE
    groupBy(doc)."""
    _check_model(model, num_buckets, portable_hash)
    grams = df.select(
        F.col(id_col),
        F.explode(_grams(F.col(text_col))).alias("_g"),
    ).select(
        id_col, _bucket(F.col("_g"), num_buckets, portable_hash).alias("bucket")
    )
    return (
        grams.join(F.broadcast(model), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("logratio"), 4).alias("logw"),
        )
    )


def _gumbel(id_col: str) -> Column:
    """Deterministic standard Gumbel noise from the doc id: u from
    the portable multiplicative hash (never exactly 0 or 1 — the
    +0.5/M midpoint), g = −ln(−ln u). Seeded-by-id sampling is the
    reproducibility contract: rerunning selection on the same corpus
    picks the same docs, and the oracle reproduces it in SQL.

    The hash routes through ``pipeline.hash_bucket`` (16-bit split
    multiply): a naive ``id * 2654435761`` overflows int64 for ids
    ≥ ~2^32 (snowflake-style, in-scope per hash_bucket's docstring) —
    ANSI mode throws, legacy mode wraps negative and log(u) of a
    negative u silently NULLs the doc out of the sample."""
    u = (hash_bucket(F.col(id_col), _M32) + F.lit(0.5)) / F.lit(float(_M32))
    return -F.log(-F.log(u))


def importance_resample(
    df: DataFrame,
    model: DataFrame | None,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    portable_hash: bool = False,
    scores: DataFrame | None = None,
) -> DataFrame:
    """Gumbel top-k importance resampling: the ``k`` docs with the
    largest ``logw + Gumbel(id)`` — a without-replacement sample with
    inclusion probability ∝ w, made deterministic by id-seeded noise.
    Returns (``id_col``, ``logw``, ``key``) with key rounded 4 dp,
    SELECTION done on unrounded keys. Global top-k is the two-stage
    shape: AQE prunes per partition, the final sort sees ≤ k·parts
    rows — never a full-corpus global sort to the driver.

    ``scores``: a precomputed ``dsir_scores(df, model, ...)`` frame —
    the precomputed-stage hook (the ``semdedup_keep`` precedent). A
    caller that scores AND resamples the same corpus under one model
    passes the (persisted) scores once instead of paying the gram
    explode + model join + per-doc sum a second time; ``model`` may
    then be ``None``. Same result by construction — the resample key
    is derived from the scores frame's own ``logw``."""
    if scores is None:
        scores = dsir_scores(
            df, model, text_col, id_col, num_buckets, portable_hash
        )
    scored = scores.withColumn("_key", F.col("logw") + _gumbel(id_col))
    return (
        scored.orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            "logw",
            F.round("_key", 4).alias("key"),
        )
    )
