"""Property-based tests (hypothesis) for engine invariants that
golden values can't cover exhaustively. Each example batches its
generated rows into ONE DataFrame so a property costs a handful of
Spark jobs, not hundreds."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.functions.distance import haversine_km
from wroclaw_bike_stats_spark.operators.dedup import exact_dedup
from wroclaw_bike_stats_spark.operators.text import lang_id

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

lat = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lon = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
coord_pair = st.tuples(lat, lon, lat, lon)

# max great-circle distance = π · R
MAX_KM = math.pi * 6371.0088


@SLOW
@given(st.lists(coord_pair, min_size=1, max_size=40))
def test_haversine_symmetry_identity_bounds(spark, pairs):
    df = spark.createDataFrame(
        pairs, ["lat1", "lon1", "lat2", "lon2"]
    ).select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"), 6).alias("fwd"),
        haversine_km(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1"), 6).alias("rev"),
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat1"), F.col("lon1"), 6).alias("self"),
    )
    for r in df.collect():
        assert r["fwd"] == pytest.approx(r["rev"], abs=1e-6)  # symmetry
        assert r["self"] == 0.0  # identity
        assert 0.0 <= r["fwd"] <= MAX_KM + 1e-6  # bounds


texts = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
    max_size=200,
)


@SLOW
@given(st.lists(texts, min_size=1, max_size=30))
def test_exact_dedup_partitions_the_corpus(spark, docs):
    """n_copies across fingerprint groups sums to the corpus size, and
    every keep_id is a real doc id."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = exact_dedup(df).collect()
    assert sum(r["n_copies"] for r in out) == len(docs)
    ids = set(range(len(docs)))
    assert all(r["keep_id"] in ids for r in out)


@SLOW
@given(st.lists(texts, min_size=1, max_size=30))
def test_lang_id_total_and_closed(spark, docs):
    """lang_id always returns a value from the closed label set."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {r["g"] for r in df.select(lang_id(F.col("text")).alias("g")).collect()}
    assert got <= {"de", "en", "es", "fr", "und"}


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), texts),
        min_size=1,
        max_size=30,
    )
)
def test_dedupe_by_uid_unique_and_stable(spark, rows):
    """After dedup, non-null uids are unique; the pick is identical
    under repartitioning."""
    from wroclaw_bike_stats_spark.operators.upsert import dedupe_batch_by_uid

    df = spark.createDataFrame(
        [(uid, t, None) for uid, t in rows],
        "uid bigint, text string, extra string",
    )
    out1 = sorted(map(tuple, dedupe_batch_by_uid(df).collect()))
    out2 = sorted(map(tuple, dedupe_batch_by_uid(df.repartition(5)).collect()))
    assert out1 == out2
    uids = [r[0] for r in out1 if r[0] is not None]
    assert len(uids) == len(set(uids))


# --- curation-operator invariants ----------------------------------------


token_counts = st.lists(
    st.integers(min_value=0, max_value=800), min_size=1, max_size=60
)


@given(counts=token_counts)
@SLOW
def test_pack_sequences_invariants(spark, counts):
    """For any token-count sequence: pack ids start at 0 and are
    contiguous; every pack except possibly a single oversize doc fits
    the budget; packing is greedy (a doc never starts a new pack if it
    fit the previous one)."""
    from wroclaw_bike_stats_spark.operators.pipeline import pack_sequences

    budget = 512
    df = spark.createDataFrame(
        [(i, 0, n) for i, n in enumerate(counts)],
        ["doc_id", "bucket", "n_tokens"],
    )
    rows = sorted(
        (r.doc_id, r.n_tokens, r.pack_id)
        for r in pack_sequences(df, budget=budget).collect()
    )
    assert len(rows) == len(counts)
    pack_ids = [p for _, _, p in rows]
    assert pack_ids[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(pack_ids, pack_ids[1:]))
    # per-pack totals
    totals: dict[int, list[int]] = {}
    for _, n, p in rows:
        totals.setdefault(p, []).append(n)
    for p, ns in totals.items():
        assert sum(ns) <= budget or len(ns) == 1  # oversize doc alone
    # greedy: first doc of pack p+1 did NOT fit at the end of pack p
    for (_, n, p), prev in zip(rows[1:], rows):
        if p == prev[2] + 1:
            assert sum(totals[prev[2]]) + n > budget


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", exclude_categories=("Cs", "Cc")
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
@SLOW
def test_scrub_pii_idempotent(spark, texts):
    """scrub(scrub(x)) == scrub(x): placeholders never re-match."""
    from wroclaw_bike_stats_spark.operators.pipeline import scrub_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "t"]
    )
    got = df.select(
        "id",
        scrub_pii(F.col("t")).alias("once"),
        scrub_pii(scrub_pii(F.col("t"))).alias("twice"),
    ).collect()
    for r in got:
        assert r.once == r.twice


@given(ids=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True))
@SLOW
def test_hash_split_partition_of_ids(spark, ids):
    """Every id lands in exactly one split, and membership is a pure
    function of the id (stable under union with other ids)."""
    from wroclaw_bike_stats_spark.operators.pipeline import hash_split_assign

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    full = {
        r.doc_id: r.split for r in hash_split_assign(df).collect()
    }
    assert set(full) == set(ids)
    half_ids = ids[: max(1, len(ids) // 2)]
    half = {
        r.doc_id: r.split
        for r in hash_split_assign(
            spark.createDataFrame([(i,) for i in half_ids], ["doc_id"])
        ).collect()
    }
    assert all(full[i] == half[i] for i in half_ids)


edge = st.tuples(
    st.integers(min_value=0, max_value=25), st.integers(min_value=0, max_value=25)
)


@SLOW
@given(st.lists(edge, min_size=1, max_size=50))
def test_connected_components_matches_union_find(spark, edges):
    """Distributed hash-min label propagation ≡ classic union-find on
    arbitrary random graphs (self-loops, duplicate and reversed edges
    included): same node set, and component_id = min node id of the
    union-find component."""
    from wroclaw_bike_stats_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        (r["node"], r["component_id"])
        for r in connected_components(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {(n, comp_min[find(n)]) for n in parent}
    assert got == expected


# word-ish docs: a few tokens from a small vocabulary so random pairs
# actually share shingles at assorted df skews
_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=1,
    max_size=10,
)


@SLOW
@given(st.lists(_words, min_size=2, max_size=25), st.sampled_from([0.3, 0.5, 0.8]))
def test_prefix_filter_equals_plain_on_random_corpora(spark, docs, threshold):
    """PPJoin prefix filtering is an exact rewrite: identical
    (id_a, id_b, jaccard) sets as the plain self-join on random
    small-vocabulary corpora (high shingle-df skew by construction),
    across thresholds."""
    from wroclaw_bike_stats_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    plain = {
        tuple(r)
        for r in ngram_jaccard_pairs(df, n=2, threshold=threshold).collect()
    }
    pref = {
        tuple(r)
        for r in ngram_jaccard_pairs(
            df, n=2, threshold=threshold, prefix_filter=True
        ).collect()
    }
    assert pref == plain


# Arrow-vs-native LM scoring parity under adversarial whitespace: the
# Arrow route re-implements Spark's tokenization in Python (trim
# strips SPACES only; Java \s = the six ASCII whitespace chars) — the
# exact place a divergence would hide. Alphabet deliberately mixes
# words, every ASCII whitespace char, and a unicode NBSP (which Java
# \s does NOT split on — both routes must treat it as a word char).
_lm_text = st.text(
    alphabet=st.sampled_from(list("ab") + [" ", "\t", "\n", "\x0b",
                                           "\f", "\r", " "]),
    max_size=30,
)


@SLOW
@given(st.lists(st.one_of(st.none(), _lm_text), min_size=1, max_size=25))
def test_bigram_lm_arrow_matches_native_on_any_whitespace(spark, texts):
    from wroclaw_bike_stats_spark.operators.text import (
        bigram_lm_score,
        bigram_lm_score_arrow,
        train_bigram_lm,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    ref = spark.createDataFrame(
        [(1, "a b a b"), (2, "a   b")], "doc_id long, text string"
    )
    uni, bi = train_bigram_lm(ref)
    native = sorted(
        map(tuple, bigram_lm_score(docs, uni, bi).collect())
    )
    arrow = sorted(
        map(tuple, bigram_lm_score_arrow(docs, uni, bi).collect())
    )
    assert arrow == native


@given(
    xs=st.lists(
        st.one_of(
            # general positive doubles across the xent/ppl range
            st.floats(min_value=1e-4, max_value=1e7, allow_nan=False),
            # adversarial: values whose shortest-decimal repr ends at
            # exactly the 5th place (the HALF_UP tie zone)
            st.integers(min_value=1, max_value=10**9).map(
                lambda k: (2 * k + 1) / 2e4
            ),
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=100, deadline=None)
def test_half_up4_matches_decimal_ground_truth(xs):
    """The Arrow LM's shipped rounding kernel == BigDecimal semantics
    (decimal.Decimal(repr(x)).quantize(4, HALF_UP)) on every input,
    including the binary-fp tie-crossing zone ADVICE r09 flagged —
    pure ground-truth check, no Spark session needed (Spark-vs-kernel
    parity is pinned separately in test_lm.py's tie battery)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from wroclaw_bike_stats_spark.operators.text import _half_up4

    got = _half_up4(np.asarray(xs, dtype=np.float64))
    q = Decimal("0.0001")
    want = [
        float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))
        for x in xs
    ]
    bad = [(x, g, w) for x, g, w in zip(xs, got, want) if g != w]
    assert not bad, bad[:5]


vec_entries = st.floats(
    min_value=-10.0, max_value=10.0, allow_nan=False, width=32
)


@SLOW
@given(
    st.integers(min_value=2, max_value=6).flatmap(
        lambda d: st.lists(
            st.lists(vec_entries, min_size=d, max_size=d),
            min_size=3,
            max_size=25,
        )
    )
)
def test_embedding_moments_match_numpy_on_random_vectors(spark, vecs):
    """The partial-aggregated moments pass == plain numpy on any
    random (n × d) batch — including degenerate corpora (constant
    columns, rank-deficient covariance)."""
    import numpy as np

    from wroclaw_bike_stats_spark.operators.embedding_stats import (
        embedding_moments,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).repartition(3)
    n, mean, cov = embedding_moments(df)
    E = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    assert n == len(vecs)
    np.testing.assert_allclose(mean, E.mean(axis=0), rtol=0, atol=1e-6)
    want = (E.T @ E) / n - np.outer(E.mean(axis=0), E.mean(axis=0))
    np.testing.assert_allclose(cov, want, rtol=0, atol=1e-5)


@SLOW
@given(
    st.lists(
        st.lists(vec_entries, min_size=4, max_size=4),
        min_size=6,
        max_size=25,
    )
)
def test_pca_explained_variance_bounds_on_random_vectors(spark, vecs):
    """fit_pca contract on arbitrary data: 0 ≤ explained ≤ total
    (within fp tolerance), orthonormal components, and projecting
    then reconstructing never increases total squared error as k
    grows from 1 to d."""
    import numpy as np

    from wroclaw_bike_stats_spark.operators.embedding_stats import fit_pca

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    E = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    mu = E.mean(axis=0)
    prev_err = None
    for k in (1, 2, 4):
        model = fit_pca(df, k=k)
        C = np.asarray(model["components"])
        np.testing.assert_allclose(
            C @ C.T, np.eye(k), rtol=0, atol=1e-6
        )
        assert -1e-6 <= model["explained_var"] <= model["total_var"] + 1e-6
        P = (E - mu) @ C.T
        err = float(((E - (P @ C + mu)) ** 2).sum())
        if prev_err is not None:
            assert err <= prev_err + 1e-6
        prev_err = err
