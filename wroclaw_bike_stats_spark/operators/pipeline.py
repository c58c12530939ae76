"""Training-data curation operators — the corpus-assembly steps a
large-scale LLM data pipeline runs between raw ingestion and training:
eval-set decontamination, per-source quota capping, deterministic
train/val/test splitting, and weighted source mixing.

Every operator here is deterministic (no RNG state — reruns, retries
and executors agree) and expressible in ANSI SQL, so each has a DuckDB
oracle in the driver gate. Scale shapes:

- ``decontaminate`` — broadcast anti-join on a fingerprint: the eval
  set is tiny next to the training corpus, so the corpus never
  shuffles; each task streams its partition against a broadcast hash
  set. O(|corpus|) with no wide exchange.
- ``cap_per_group`` — one shuffle on the group key + a bounded
  row_number; the cap means no reducer materializes more than the
  quota per key beyond the sort.
- ``hash_split_assign`` / ``weighted_mix_assign`` — pure map-side
  column arithmetic (a Knuth multiplicative hash mod 100): zero
  shuffle, splits are stable under re-partitioning, appends, and
  engine changes, which is what makes them auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative hash constant (2^32 / phi). Public domain
# arithmetic on int64 — bit-identical in Spark and DuckDB, unlike
# xxhash64 which only Spark exposes.
_KNUTH = 2654435761
_MOD = 4294967296  # 2^32


def norm_text(col):
    """Whitespace/case normalization shared with functions used by the
    fingerprint gate (operators/text.py): lower, trim, collapse runs of
    whitespace. Decontamination must not be defeated by formatting."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def hash_bucket(col, buckets: int = 100):
    """Deterministic [0, buckets) bucket from a non-negative integer id
    column: ``(id * _KNUTH) mod 2^32 mod buckets``.

    The multiply is done as a 16-bit split so every intermediate stays
    below 2^49: a naive ``id * 2654435761`` overflows int64 for ids
    ≥ ~2^32 (snowflake-style ids) and ANSI mode — Spark 4's default —
    throws instead of wrapping. Congruence: with a = id mod 2^32 and
    K = K_hi·2^16 + K_lo,  a·K ≡ a·K_lo + (a·K_hi mod 2^16)·2^16
    (mod 2^32). DuckDB's oracle arithmetic promotes to HUGEINT, so its
    full-width product agrees exactly.
    """
    k_hi, k_lo = _KNUTH >> 16, _KNUTH & 0xFFFF
    a = F.pmod(col.cast("long"), F.lit(_MOD))
    lo = F.pmod(a * F.lit(k_lo), F.lit(_MOD))
    hi = F.pmod(a * F.lit(k_hi), F.lit(65536)) * F.lit(65536)
    return F.pmod(F.pmod(lo + hi, F.lit(_MOD)), F.lit(buckets))


# Above this many distinct exclusion fingerprints, auto mode routes
# decontamination through the shuffle anti-join instead of a forced
# broadcast: ~1M 32-char md5 strings is ~100 MB as a broadcast hash
# relation — shippable once, but at 1000 executors that's 100 GB of
# aggregate network and a JVM-heap spike per executor, while the
# shuffle route moves each side once, partitioned.
BROADCAST_MAX_FPS = 1_000_000


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    broadcast: bool | None = None,
    broadcast_max_fps: int = BROADCAST_MAX_FPS,
) -> DataFrame:
    """Drop corpus documents whose normalized-text fingerprint appears
    in the eval set (train/test leakage removal).

    With ``broadcast`` (the right call for real eval sets — thousands
    of fingerprints) the corpus side never shuffles: each task streams
    its partition against a broadcast hash set. Pass
    ``broadcast=False`` when the exclusion list is itself huge (e.g.
    a billion-key blocklist) — the anti-join then shuffles both sides
    on the fingerprint instead of OOMing every executor on a forced
    broadcast. The default ``broadcast=None`` AUTO-SWITCHES: it counts
    the distinct exclusion fingerprints (one map-side-combined agg
    over the exclusion list — proportional to the blocklist, cheap
    next to the join itself) and broadcasts only when the count is ≤
    ``broadcast_max_fps``. Matching is exact on md5(normalized text);
    for fuzzy decontamination compose with the near-dup operators
    (dedup.py) using eval docs as one side of the candidate join.
    """
    fp = F.md5(norm_text(F.col(text_col)))
    eval_fps = eval_set.select(fp.alias("_fp")).distinct()
    if broadcast is None:
        # r15: the auto route's sizing count already materializes the
        # distinct fingerprints — scratch-persist them so the anti-join
        # reads the cache instead of re-fingerprinting + re-distincting
        # the whole blocklist (measured ~1 s of the decontam_shuffle
        # gate's 2.2 s at the 1.2M-entry blocklist; at a billion-key
        # blocklist it halves the exclusion-side work). Dropped at
        # release_shared()/scratch.release().
        from wroclaw_bike_stats_spark.operators.scratch import persist as _sp

        eval_fps = _sp(eval_fps)
        broadcast = eval_fps.count() <= broadcast_max_fps
    if broadcast:
        eval_fps = F.broadcast(eval_fps)
    return corpus.withColumn("_fp", fp).join(
        eval_fps, "_fp", "left_anti"
    ).drop("_fp")


def decontaminate_ngram(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    broadcast: bool | None = None,
    broadcast_max_fps: int = BROADCAST_MAX_FPS,
) -> DataFrame:
    """Drop corpus documents sharing ANY word ``n``-gram with the eval
    set — the standard contamination rule for benchmark protection
    (a 13-gram collision is the common industry setting), strictly
    stronger than ``decontaminate``'s exact-normalized match.

    Shape at 100 TB: the eval side is small — its distinct n-gram set
    broadcasts; the corpus side makes ONE narrow pass emitting its
    n-grams (Arrow-batched, same shingler as the dedup family) and a
    broadcast semi-join marks contaminated ids. No corpus shuffle;
    cost is linear in corpus tokens. The default ``broadcast=None``
    auto-switches exactly like ``decontaminate``: an eval side whose
    distinct n-gram set exceeds ``broadcast_max_fps`` (n-grams
    multiply — 1M eval docs emit tens of millions) routes through the
    shuffle semi-join instead of a forced broadcast. Documents shorter
    than ``n`` tokens emit a single whole-doc shingle (shingler
    contract), so a short doc is dropped only if the eval set contains
    that exact short text.
    """
    from wroclaw_bike_stats_spark.operators.dedup import _shingle_table

    ev_grams = (
        _shingle_table(eval_set, text_col, id_col, n)
        .select("shingle")
        .distinct()
    )
    if broadcast is None:
        broadcast = ev_grams.count() <= broadcast_max_fps
    if broadcast:
        ev_grams = F.broadcast(ev_grams)
    contaminated = (
        _shingle_table(corpus, text_col, id_col, n)
        .join(ev_grams, "shingle", "left_semi")
        .select(F.col("_id").alias(id_col))
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def fuzzy_contaminated_pairs(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
    method: str = "exact",
    num_hashes: int = 128,
    bands: int = 16,
) -> DataFrame:
    """(doc_id, eval_id, jaccard) for every corpus×eval pair with word
    ``n``-gram Jaccard ≥ threshold — the NEAR-duplicate contamination
    report behind ``decontaminate_fuzzy`` (the RefinedWeb/Llama-style
    fuzzy decontamination rule, vs ``decontaminate_ngram``'s
    any-shared-gram rule which is stricter but unscored).

    ``method="exact"`` (default; the oracle-gated route): both sides'
    distinct hashed shingles, per-doc set sizes computed MAP-SIDE from
    the un-exploded shingle arrays (no corpus-wide count shuffle) and
    carried inline through the join — the only shuffle is the
    (corpus_doc, eval_doc) intersection groupBy, whose input is just
    the shingle matches against the BROADCAST eval side. Cost: one
    narrow corpus pass + one matched-rows shuffle.

    ``method="minhash"``: corpus docs are first pre-filtered to those
    sharing ≥1 MinHash LSH band with any eval doc (eval band table
    broadcast), then the exact verify above runs on that sliver.
    Linear signature pass over the corpus, per-doc recall < 1 like
    every LSH route (measured in tests); the route for eval sets too
    gram-rich to broadcast as shingles.
    """
    from wroclaw_bike_stats_spark.operators.dedup import (
        _make_hashed_shingle_udf,
        minhash_band_table,
        minhash_signatures,
    )

    eval_id_col = eval_id_col or id_col
    if method == "minhash":
        ev_bands = minhash_band_table(
            minhash_signatures(
                eval_set, text_col, eval_id_col,
                num_hashes=num_hashes, shingle_n=n,
            ),
            bands=bands,
        ).select("band_idx", "band_hash")
        c_bands = minhash_band_table(
            minhash_signatures(
                corpus, text_col, id_col,
                num_hashes=num_hashes, shingle_n=n,
            ),
            bands=bands,
        )
        cand_ids = (
            c_bands.join(
                F.broadcast(ev_bands), ["band_idx", "band_hash"], "left_semi"
            )
            .select(F.col("_id").alias(id_col))
            .distinct()
        )
        corpus = corpus.join(F.broadcast(cand_ids), id_col, "left_semi")
    elif method != "exact":
        raise ValueError(f"unknown method {method!r}")

    sh = _make_hashed_shingle_udf(n)
    c = corpus.select(
        F.col(id_col).alias("_cid"), sh(F.col(text_col)).alias("_arr")
    ).select("_cid", F.size("_arr").alias("_cn"), F.explode("_arr").alias("shingle"))
    e = eval_set.select(
        F.col(eval_id_col).alias("_eid"), sh(F.col(text_col)).alias("_arr")
    ).select("_eid", F.size("_arr").alias("_en"), F.explode("_arr").alias("shingle"))
    inter = (
        c.join(F.broadcast(e), "shingle")
        .groupBy("_cid", "_eid")
        .agg(
            F.count(F.lit(1)).alias("_common"),
            F.first("_cn").alias("_cn"),
            F.first("_en").alias("_en"),
        )
    )
    jac = F.round(
        F.col("_common") / (F.col("_cn") + F.col("_en") - F.col("_common")), 6
    )
    return (
        inter.select(
            F.col("_cid").alias(id_col),
            F.col("_eid").alias("eval_id"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def decontaminate_fuzzy(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
    method: str = "exact",
    num_hashes: int = 128,
    bands: int = 16,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Drop corpus documents whose ``n``-gram Jaccard against ANY eval
    document reaches ``threshold`` — fuzzy decontamination. Sits
    between ``decontaminate`` (exact normalized text) and
    ``decontaminate_ngram`` (any single shared gram): it catches
    paraphrase-level overlap without nuking every doc that quotes one
    common phrase. See ``fuzzy_contaminated_pairs`` for shapes.

    ``pairs``: a precomputed ``fuzzy_contaminated_pairs`` frame for
    the same corpus/eval/params — the precomputed-stage hook (the
    ``semdedup_keep`` precedent): an auditor that reports the pair
    list AND drops the hits pays the shingle join once (pass the
    persisted report). Same result by construction — the anti-join
    keys off the frame's ``id_col``."""
    if pairs is None:
        pairs = fuzzy_contaminated_pairs(
            corpus, eval_set, text_col, id_col, eval_id_col, n, threshold,
            method, num_hashes, bands,
        )
    hits = pairs.select(id_col).distinct()
    return corpus.join(hits, id_col, "left_anti")


def _bloom_bitset_params(n_keys: int, bits_per_key: int) -> tuple[int, int]:
    """(m_bits, k_hashes) for a Bloom filter sized at ``bits_per_key``
    bits per key. m rounds up to a power of two so every position is a
    mask, not a modulo; optimal k = m/n·ln2 ≈ 0.69·bits_per_key."""
    import math

    m = 1 << max(6, (max(n_keys, 1) * bits_per_key - 1).bit_length())
    k = max(1, round(m / max(n_keys, 1) * math.log(2)))
    return m, min(k, 30)


def _bloom_positions(h, m: int, k: int, np):
    """(len(h), k) bit positions via Kirsch–Mitzenmacher double
    hashing: pos_i = h1 + i·h2 (mod m), h2 forced odd so the stride
    walks the full power-of-two table."""
    h1 = h & np.uint64(m - 1)
    h2 = ((h >> np.uint64(33)) << np.uint64(1)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(m - 1)


def build_ngram_bloom(
    eval_set: DataFrame | None,
    text_col: str = "text",
    n: int = 13,
    bits_per_key: int = 16,
    grams: DataFrame | None = None,
):
    """Bloom bitset over the eval set's hashed word ``n``-grams.

    Distributed build: each Arrow batch of eval docs hashes its grams
    (``dedup._shingle_hash_batch`` — the family's one shingle-hash
    scheme) and sets bits in a PARTIAL bitset; partials are OR-merged
    with ``treeReduce`` so the driver never holds more than
    O(log partitions) bitsets. Returns ``(bitset uint64[], m, k)``.

    ``grams``: a precomputed single-column frame of hashed grams —
    pass a PERSISTED one to pay the eval-side shingle pass once
    across the sizing count, the bitset build, and a later verify
    join (``decontaminate_ngram_bloom`` does exactly this; the eval
    side is the operator's dominant cost at blocklist scale).

    Sizing: m comes from a distinct-gram count over that frame. At 16
    bits/key the false-positive rate is ~4·10⁻⁴; 1 BILLION eval grams
    fit in a 2 GB bitset where a broadcast hash relation of the same
    grams is ~100 GB — this is what extends the zero-corpus-shuffle
    decontamination route past ``BROADCAST_MAX_FPS``.

    The bitset lives only in-session (built and consumed by the same
    pandas hash), so no cross-process ``hash_array`` identity guard is
    needed — unlike the STORED MinHash band tables (dedup.py)."""
    import numpy as np

    from wroclaw_bike_stats_spark.operators.dedup import (
        _make_hashed_shingle_udf,
    )

    if grams is None:
        grams = eval_set.select(
            F.explode(_make_hashed_shingle_udf(n)(F.col(text_col))).alias("g")
        )
    else:
        grams = grams.toDF("g")
    n_keys = grams.agg(F.approx_count_distinct("g").alias("n")).first()["n"]
    m, k = _bloom_bitset_params(n_keys, bits_per_key)
    words = m // 64

    def partial(pdf_iter):
        import pandas as pd

        bits = np.zeros(words, dtype=np.uint64)
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            h = pdf["g"].to_numpy().astype(np.uint64)
            pos = _bloom_positions(h, m, k, np).ravel()
            np.bitwise_or.at(
                bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63))
            )
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = grams.mapInPandas(partial, "bits binary").rdd.map(
        lambda r: np.frombuffer(r["bits"], dtype=np.uint64)
    )
    bitset = partials.treeReduce(np.bitwise_or)
    return bitset, m, k


def decontaminate_ngram_bloom(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    bits_per_key: int = 16,
    verify: bool = True,
    bloom: tuple | None = None,
) -> DataFrame:
    """``decontaminate_ngram`` semantics through a Bloom prefilter —
    the route for eval/blocklist sides too large to broadcast as a
    hash relation (where the auto mode above falls back to shuffling
    the ENTIRE corpus gram table).

    ``bloom`` (r15, the precomputed-stage hook pattern): a prebuilt
    ``(bitset, m, k)`` from :func:`build_ngram_bloom` — ``bitset`` as
    the uint64 array or its ``tobytes()``. The bitset is a STANDING
    ASSET (the blocklist changes rarely; the docstring below always
    said "at scale build it once outside the plan") — without the
    hook every call re-ran the eager build jobs (gram count +
    map/treeReduce) at plan-construction time. MUST be built over the
    same ``(eval_set, n)``; the verify join still runs against
    ``eval_set``, so a stale bitset can only over-suspect (false
    positives are verified away), never under-drop... unless grams
    were REMOVED from the eval set, which invalidates the asset like
    any standing index.

    1. Bloom bitset over hashed eval grams (``build_ngram_bloom``) —
       ~10–20 bits/gram, broadcast once.
    2. One narrow corpus pass (``mapInPandas``): each doc's grams are
       hashed and probed against the bitset; docs with ≥1 hit become
       SUSPECTS. No corpus shuffle, no exploded gram table in the JVM.
    3. ``verify=True`` (default): HASHED-shingle semi-join of the
       suspects' grams against the eval grams — the expensive join
       now runs over the (contaminated + false-positive) sliver
       instead of the whole corpus, so its shuffle volume is
       eval-grams + suspect-grams; the eval gram frame is hashed and
       persisted ONCE and feeds the sizing count, the bitset build
       AND this join (the r07 first cut re-shingled the eval side
       three times — at blocklist scale that tripled the dominant
       cost). Bloom false negatives are impossible (a string match
       implies a hash match implies set bits), so the verified result
       equals ``decontaminate_ngram`` up to 64-bit shingle-hash
       collisions — the module's documented tolerance
       (``dedup._shingle_table``), shared with the ngram_jaccard
       gates. ``verify=False`` skips the join and over-drops by the
       measured ~4·10⁻⁴ FP rate (acceptable for a training corpus,
       not for a parity gate).
    """
    import numpy as np

    from wroclaw_bike_stats_spark.operators.dedup import (
        _shingle_hash_batch,
        _shingle_table,
    )
    from wroclaw_bike_stats_spark.operators.scratch import persist as _sp

    ev_grams = _sp(
        _shingle_table(eval_set, text_col, id_col, n, hashed=True)
        .select("shingle")
        .distinct()
    )
    if bloom is None:
        bitset, m, k = build_ngram_bloom(
            None, text_col, n, bits_per_key, grams=ev_grams
        )
        raw = bitset.tobytes()
    else:
        bitset, m, k = bloom
        raw = (
            bitset
            if isinstance(bitset, (bytes, bytearray))
            else bitset.tobytes()
        )
    bc = corpus.sparkSession.sparkContext.broadcast(raw)

    def probe(pdf_iter):
        import pandas as pd

        bits = np.frombuffer(bc.value, dtype=np.uint64)
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            texts = pdf[text_col]
            h, counts = _shingle_hash_batch(texts, n, np)
            if len(h) == 0:
                continue
            pos = _bloom_positions(h.astype(np.uint64), m, k, np)
            word = bits[pos >> np.uint64(6)]
            mask = np.uint64(1) << (pos & np.uint64(63))
            gram_hit = ((word & mask) == mask).all(axis=1)
            doc_of = np.repeat(np.arange(len(counts)), counts)
            doc_hit = np.zeros(len(counts), dtype=bool)
            np.logical_or.at(doc_hit, doc_of, gram_hit)
            if doc_hit.any():
                yield pd.DataFrame({id_col: pdf[id_col].to_numpy()[doc_hit]})

    id_type = corpus.schema[id_col].dataType.simpleString()
    # r15: the probe is the operator's dominant corpus-side cost (per-
    # doc shingle hashing + k bitset probes per gram — measured 2.0 s
    # on ONE task at the bench sf, where the single-file input plans a
    # one-task scan); fan the probe input up to the session
    # parallelism when the scan is under-parallel (no-op at scale).
    from wroclaw_bike_stats_spark.operators.fanout import ensure_parallelism

    suspects = ensure_parallelism(
        corpus.select(id_col, text_col)
    ).mapInPandas(probe, f"{id_col} {id_type}")
    if not verify:
        return corpus.join(suspects, id_col, "left_anti")
    suspect_docs = corpus.join(F.broadcast(suspects), id_col, "left_semi")
    contaminated = (
        _shingle_table(suspect_docs, text_col, id_col, n, hashed=True)
        .join(ev_grams, "shingle", "left_semi")
        .select(F.col("_id").alias(id_col))
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    n: int,
    two_phase: bool = False,
    group_limit_pushdown: bool = False,
) -> DataFrame:
    """Keep at most ``n`` rows per group, deterministically — the
    domain-quota step that stops a single source/domain from dominating
    a training mix. Ordering must be a total order (include a unique
    tie-breaker column) so reruns keep the same rows.

    Strategy knobs, all measured at the 100× scaling point (15M
    orders, 1.5M customer groups, 93% over quota; SCALING.md r06):

    ``group_limit_pushdown=False`` (default): suppress Spark's
    WindowGroupLimit rewrite for the rank filter. That rule inserts a
    MAP-SIDE per-group top-n (an extra full sort of every input
    partition) before the shuffle — a huge win when a few giant
    groups dominate, but pure overhead when group cardinality is
    comparable to row count (domains/users/sources — this operator's
    stated regime): most groups appear once per input partition, so
    nothing prunes and the extra sort triples the cost (measured
    16.6 s → 5.5 s suppressed). Suppression is expressed as an
    ``isin`` rank filter (semantically identical for row_number ≥ 1)
    because the rule pattern-matches binary comparisons; for n > 1024
    the literal list would bloat the plan, so the plain filter — and
    with it Spark's rewrite — is used regardless. Pass True when the
    workload IS few-giant-groups.

    ``two_phase=True``: count rows per group first (key-only
    aggregate, map-side combined), broadcast the over-quota group
    list, window ONLY those groups; under-quota rows pass through a
    broadcast anti-join — a MAP-SIDE pass, so rows in under-quota
    groups are never shuffled at all. Wins when over-quota groups are
    sparse (measured 4.6 s vs 19.1 s naive window with zero groups
    over quota); loses when most groups exceed quota (12.0 s vs 5.5 s
    at 93% over — three passes that skip nothing). Keep it off unless
    the quota is rarely hit."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*[F.asc(c) for c in order_cols])

    def _rank_filter(d: DataFrame) -> DataFrame:
        d = d.withColumn("_rn", F.row_number().over(w))
        if not group_limit_pushdown and n <= 1024:
            d = d.filter(F.col("_rn").isin(list(range(1, n + 1))))
        else:
            d = d.filter(F.col("_rn") <= n)
        return d.drop("_rn")

    if not two_phase:
        return _rank_filter(df)
    # Null-safe join condition: a NULL group key is one group too
    # (the window path caps it — partitionBy puts all nulls in one
    # partition), so the over-quota routing must match it. A plain
    # equi-join on the key never matches NULL and silently exempted
    # null-key rows from the quota on this route (round-6 review
    # finding, regression-tested).
    over = F.broadcast(
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > n)
        .select(F.col(group_col).alias("_over_g"))
    )
    cond = F.col(group_col).eqNullSafe(F.col("_over_g"))
    under_rows = df.join(over, cond, "left_anti")
    capped = _rank_filter(df.join(over, cond, "left_semi"))
    return under_rows.unionByName(capped)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into fixed-size overlapping token windows —
    the chunking step between corpus curation and training-example
    assembly (long docs exceed the context budget; overlap preserves
    boundary context). Chunk ``i`` covers whitespace tokens
    ``[i*stride, i*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; the last chunk may be shorter;
    every doc yields >= 1 chunk (tokenizer contract: an
    empty/whitespace doc is one empty token).

    Output: (id, chunk_id, chunk_text, n_tokens), deterministic.

    Scale shape: a narrow map + generate, NO shuffle. The chunk
    strings are assembled INSIDE one ``transform`` over the chunk
    index sequence and only then exploded — exploding first and
    slicing after would copy the doc's full token array into every
    output row (O(n²/stride) bytes for an n-token doc; a 100k-token
    doc would amplify 1000×). Work per doc is
    O(n · max_tokens/stride), i.e. linear with a small overlap
    factor. SQL-oracle-expressible (list slicing + generate_series).
    """
    from wroclaw_bike_stats_spark.operators.text import tokens

    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}"
        )
    stride = max_tokens - overlap
    # NULL text behaves like empty text (one empty-token chunk) —
    # without the coalesce, size(NULL) = -1 would emit a garbage
    # (NULL, -1) chunk instead of honoring the >= 1 chunk contract
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(
                F.slice(toks, i * stride + 1, max_tokens), " "
            ).alias("chunk_text"),
            F.least(F.lit(max_tokens), n - i * stride).alias("n_tokens"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_c"),
    ).select(
        id_col,
        "chunk_id",
        F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_tokens").alias("n_tokens"),
    )


def corpus_token_budget(
    df: DataFrame,
    group_cols: "list[str] | str" = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus budget report: docs, whitespace tokens, UTF-8
    bytes, and each group's token share — the numbers a mixing /
    epoch-planning decision actually consumes (`temperature_mix_rates`
    eats the counts; a human eats the shares). ONE map-side-combined
    aggregation + a broadcast 1-row total; NULL text counts as 0
    tokens / 0 bytes."""
    from wroclaw_bike_stats_spark.operators.text import token_count_ws

    cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    text = F.coalesce(F.col(text_col), F.lit(""))
    per = df.groupBy(*cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_ws(text)).alias("n_tokens"),
        F.sum(F.length(F.encode(text, "UTF-8"))).alias("n_bytes"),
    )
    tot = per.agg(F.sum("n_tokens").alias("_tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        *cols,
        "n_docs",
        "n_tokens",
        "n_bytes",
        F.round(F.col("n_tokens") / F.greatest("_tot", F.lit(1)), 6).alias(
            "token_share"
        ),
    )


def temperature_mix_rates(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-source sampling rates for TEMPERATURE-scaled mixing — the
    multilingual-LM rebalancing rule (XLM-R §3.1 / mT5: sample source
    i with probability pᵢ ∝ nᵢ^α, α<1 flattens the distribution so
    head sources shrink and tail sources grow).

    Returns the lazy one-aggregation frame (source, n_rows, rate):
    ``rate = pᵢ·N/nᵢ`` is the PER-ROW multiplicity that realizes the
    target share — < 1 downsamples a head source, > 1 upsamples a
    tail source with whole-copy repeats. Rates are rounded to 6 dp —
    the boundary convention that keeps the deterministic accept step
    (`temperature_mix_apply`) bit-stable across engines."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").alias("_N"),
        F.sum(F.pow("n_rows", F.lit(alpha))).alias("_sp"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_rows",
        F.round(
            F.pow("n_rows", F.lit(alpha)) / F.col("_sp")
            * F.col("_N") / F.col("n_rows"),
            6,
        ).alias("rate"),
    )


def temperature_mix_apply(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.3,
    id_col: str = "doc_id",
    rates: DataFrame | None = None,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Materialize a temperature-scaled mix deterministically: each
    row appears ``floor(rate)`` times plus one more iff its id's hash
    bucket (out of ``resolution``) falls under the fractional part —
    so realized counts hit the target share within hash noise, with
    ZERO RNG state (reruns, retries and engines agree).

    Adds ``copy`` (0-based repeat index — downstream shuffling/packing
    needs distinct example identities). Shape: the rates frame is a
    #sources-row broadcast join; the repeat is a map-side
    explode(sequence) — no corpus shuffle, and the whole plan stays
    lazy (rates may be passed precomputed, e.g. thinned or edited by
    an operator)."""
    if rates is None:
        rates = temperature_mix_rates(df, source_col, alpha)
    whole = F.floor("rate").cast("long")
    frac = F.col("rate") - F.floor("rate")
    extra = (
        hash_bucket(F.col(id_col), resolution)
        < F.round(frac * resolution, 0).cast("long")
    ).cast("long")
    k = (whole + extra).alias("_k")
    # NULL-safe rate join: groupBy keeps a NULL-source group and
    # computes its rate, but a plain equi-join key never matches NULL
    # — null-source rows would silently VANISH from the mix (neither
    # sampled nor passed through). <=> keeps them governed by their
    # own group's rate.
    r = rates.select(F.col(source_col).alias("_mix_src"), "rate")
    return (
        df.join(
            F.broadcast(r), df[source_col].eqNullSafe(r["_mix_src"])
        )
        .drop("_mix_src")
        .withColumn("_k", k)
        .filter(F.col("_k") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.col("_k") - 1))
        )
        .drop("rate", "_k")
    )


def hash_split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    out: str = "split",
) -> DataFrame:
    """Assign train/val/test by hashing the id into 100 buckets:
    bucket < train_pct → train, < train_pct+val_pct → val, else test.

    Hash-based (not modulo-on-raw-id) so sequential or strided id
    assignment schemes don't bias a split; narrow (no shuffle, no
    sample()) so membership is reproducible forever from the id alone.
    """
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        out,
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def add_global_index(
    df: DataFrame,
    order_col: "str | list[str]",
    out: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based global index in ``order_col`` order — stable
    example ids for a training corpus — WITHOUT the single-partition
    global sort. ``order_col`` may be a list for a composite order
    (e.g. a hash key plus the unique id as tie-break).

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses
    the whole table into one reducer; at 100 TB that is the job. The
    distributed shape is the classic two-phase rank:

    1. ``repartitionByRange(order_col)`` — one range shuffle, Spark
       samples split points, partitions are globally ordered.
    2. Per-partition local ``row_number`` (a window PARTITIONED by the
       range-partition id — parallel, no collapse).
    3. Per-partition counts (tiny aggregate) → prefix-sum offsets,
       broadcast back and added to the local rank.

    Deterministic for a total ``order_col`` order (ties across
    partition boundaries would be split arbitrarily — pass a unique
    key). Equivalent SQL: ``row_number() OVER (ORDER BY order_col)-1``.
    """
    from pyspark.sql import Window

    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *[F.col(c) for c in cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn("_rn", F.row_number().over(w) - 1)
    counts = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    # counts has one row per partition — broadcast, never a real shuffle
    return (
        local.join(F.broadcast(counts), "_pid")
        .withColumn(out, (F.col("_rn") + F.col("_offset")).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )


def shuffle_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    out: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: every LLM pipeline
    permutes the curated corpus before packing so batches decorrelate
    from source/crawl/time order — this does it with ZERO RNG state.

    Order key = the Knuth multiplicative hash of the id (an odd
    multiplier mod 2³² is a BIJECTION on [0, 2³²), so distinct ids
    under 2³² never collide; above that the id itself is the
    tie-break), ranked by the two-phase ``add_global_index`` — one
    range shuffle, no single-reducer sort. Rerunning, re-partitioning
    or re-ingesting yields the identical permutation, which is what
    makes a training run's data order auditable and resumable."""
    key = hash_bucket(F.col(id_col), _MOD)
    return add_global_index(
        df.withColumn("_shuffle_key", key),
        ["_shuffle_key", id_col],
        out=out,
        num_partitions=num_partitions,
    ).drop("_shuffle_key")


# PII patterns shared verbatim with the DuckDB oracle: restricted to
# the Java-regex ∩ RE2 subset (character classes, bounded repetition,
# \b — no lookaround, no backrefs) so both engines match identically.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\+\d{2} \d{3}-\d{3}-\d{3}", "[PHONE]"),
}
# Redaction order is load-bearing (emails contain digits/dots that the
# looser patterns could clip mid-token) — keep email first.
_PII_ORDER = ["email", "ipv4", "phone"]


def pii_count(col, kind: str):
    """Occurrence count of one PII pattern (native regexp_count)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind][0]))


def scrub_pii(col):
    """Replace emails, IPv4 addresses and phone numbers with typed
    placeholder tokens. Pure JVM regexp_replace chain — codegen'd,
    no Python in the hot path; counts stay available via
    ``pii_count`` on the ORIGINAL column (order-independent)."""
    out = col
    for kind in _PII_ORDER:
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def pack_sequences(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    bucket_col: str = "bucket",
    order_col: str = "doc_id",
    budget: int = 512,
) -> DataFrame:
    """Greedy first-fit sequence packing: within each bucket, walk
    documents in ``order_col`` order and fill packs up to ``budget``
    tokens; a document that would overflow starts the next pack (an
    oversize document occupies a pack alone).

    The packing prefix-sum is inherently sequential PER BUCKET, so the
    bucket is the parallelism unit: ``applyInPandas`` over buckets —
    one shuffle on the bucket key, then linear local work per group.
    At 100 TB you size the bucket count so each bucket's metadata
    (id + token count, not the text) fits a task; the assignment is
    deterministic from (bucket, order) alone, so retries and reruns
    agree. Oracle: per-bucket recursive CTE in DuckDB.
    """

    def _pack(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        pack_ids = []
        cum = 0
        pack = 0
        for i, n in enumerate(pdf[tokens_col]):
            n = int(n)
            if i == 0:
                cum = n
            elif cum + n > budget:
                pack += 1
                cum = n
            else:
                cum += n
            pack_ids.append(pack)
        pdf["pack_id"] = pack_ids
        return pdf[[order_col, bucket_col, tokens_col, "pack_id"]]

    in_schema = df.select(order_col, bucket_col, tokens_col).schema
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema
    ) + ", pack_id long"
    return (
        df.select(order_col, bucket_col, tokens_col)
        .groupBy(bucket_col)
        .applyInPandas(_pack, schema=out_schema)
    )


def weighted_mix_assign(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample each source to its mix weight (fraction kept in
    [0, 1]) with the same deterministic bucket hash, keeping rows whose
    bucket falls under weight×100. Sources absent from ``weights``
    are dropped — an explicit mix is the whole point.

    Map-side only: at 100 TB the mix is a predicate pushed to the
    scan, not a sampled shuffle.
    """
    b = hash_bucket(F.col(id_col))
    keep = F.lit(False)
    for src, w in sorted(weights.items()):
        keep = keep | ((F.col(source_col) == src) & (b < int(round(w * 100))))
    return df.filter(keep)
