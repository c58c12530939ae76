"""Bigram-LM perplexity scoring (operators/text.py train_bigram_lm /
bigram_lm_score): hand-computed probabilities, smoothing and OOV
semantics, model-merge monoid, plan shape. End-to-end values are
oracle-verified in the driver gate (test_entry_oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import text as T


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id int, text string"
    )
    uni, bi = T.train_bigram_lm(ref)
    return uni, bi


def test_count_tables(model):
    uni, bi = model
    assert {(r.w, r.c1) for r in uni.collect()} == {
        ("a", 3), ("b", 2), ("c", 1)
    }
    assert {(r.w1, r.w2, r.c12) for r in bi.collect()} == {
        ("a", "b", 2), ("b", "a", 1), ("a", "c", 1)
    }


def test_hand_computed_scores(spark, model):
    """V = 3 vocab + 1 = 4; alpha=0.5:
    P(b|a) = (2+.5)/(3+.5*4) = 0.5  -> xent 1 bit, ppl 2
    OOV w1: P(a|z) = (0+.5)/(0+2) = 0.25 -> xent 2 bits, ppl 4
    single-token doc: no bigrams, NULL scores."""
    uni, bi = model
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "z a"), (12, "a"), (13, None)],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.xent_bits, r.ppl)
        for r in T.bigram_lm_score(docs, uni, bi, alpha=0.5).collect()
    }
    assert got == {
        10: (1, 1.0, 2.0),
        11: (1, 2.0, 4.0),
        12: (0, None, None),
        13: (0, None, None),
    }


def test_fluent_text_scores_below_scrambled_and_oov(spark):
    """The point of the filter: text following the reference's
    bigram structure scores lower perplexity than the same words
    scrambled (pairs unseen) and than pure OOV babble. (The sf
    corpora are near-uniform word salad where in-vocab and OOV
    perplexity coincide at ~log2(V) by construction — bigram
    STRUCTURE is what the model measures, so the fixture has some.
    No claim between scrambled and OOV: add-α gives an unseen
    CONTEXT the near-uniform 1/V while a high-count context
    sharply penalizes unseen continuations — scrambled in-vocab
    text can legitimately score worse than OOV.)"""
    ref = spark.createDataFrame(
        [(i, "a b c d " * 10) for i in range(5)],
        "doc_id int, text string",
    )
    uni, bi = T.train_bigram_lm(ref)
    probe = spark.createDataFrame(
        [(1, "a b c d a b c d"),   # in-distribution
         (2, "d b a c d b a c"),   # same vocab, unseen pairs
         (3, "zz qq ww ee rr tt")],  # OOV
        "doc_id int, text string",
    )
    got = {r.doc_id: r.ppl for r in
           T.bigram_lm_score(probe, uni, bi).collect()}
    assert got[1] < got[2] and got[1] < got[3], got


def test_model_counts_merge_as_monoid(spark):
    """Two shards' count tables summed == the whole corpus's tables
    (the stored-model maintenance story)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a, b = (docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1))
    ua, ba = T.train_bigram_lm(a)
    ub, bb = T.train_bigram_lm(b)
    uni_merged = {
        (r.w, r.c1)
        for r in ua.unionByName(ub).groupBy("w")
        .agg(F.sum("c1").alias("c1")).collect()
    }
    uni_whole = {(r.w, r.c1) for r in T.train_bigram_lm(docs)[0].collect()}
    assert uni_merged == uni_whole
    bi_merged = {
        (r.w1, r.w2, r.c12)
        for r in ba.unionByName(bb).groupBy("w1", "w2")
        .agg(F.sum("c12").alias("c12")).collect()
    }
    bi_whole = {
        (r.w1, r.w2, r.c12) for r in T.train_bigram_lm(docs)[1].collect()
    }
    assert bi_merged == bi_whole


def test_score_plan_is_broadcast_and_python_free(spark, model):
    """The NATIVE route (pinned — the library default is auto→arrow
    since r14): both model count-table joins are broadcast; no Python
    in the plan. (The final doc-coverage join legitimately shuffles by
    doc id — `scored` is corpus-sized at scale — so no blanket
    SortMergeJoin assertion.)"""
    uni, bi = model
    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = (
        T.bigram_lm_score(docs, uni, bi, impl="native")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_ppl_bucket_modes_agree(spark):
    """The approx (sketch-threshold, production) and exact (global
    ntile, verification) tercile assignments agree on ~all docs; the
    approx plan has no single-partition global-sort window."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 7 == 3)
    uni, bi = T.train_bigram_lm(ref)
    scores = T.bigram_lm_score(docs, uni, bi).cache()
    try:
        exact = {
            r.doc_id: r.bucket
            for r in T.ppl_bucket_assign(scores, mode="exact").collect()
        }
        approx = {
            r.doc_id: r.bucket
            for r in T.ppl_bucket_assign(scores, mode="approx").collect()
        }
        n = len(exact)
        agree = sum(1 for k in exact if exact[k] == approx[k])
        assert agree / n >= 0.97, (agree, n)
        # every bucket non-empty in both modes
        assert set(exact.values()) == {"head", "middle", "tail"}
        assert set(approx.values()) == {"head", "middle", "tail"}
        # approx mode: no ntile window in the plan (no global sort)
        plan = (
            T.ppl_bucket_assign(scores, mode="approx")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ntile" not in plan.lower(), plan
    finally:
        scores.unpersist()
    with pytest.raises(ValueError, match="unknown mode"):
        T.ppl_bucket_assign(scores, mode="median")


def test_corpus_scale_route_degrades_to_shuffle_joins(spark, model):
    """broadcast_model=False is the 100 TB route — a corpus-trained
    model's count tables won't broadcast. The route carries no hint,
    so join strategy is AQE's size-based runtime call; with broadcast
    disabled outright the model joins must compile to shuffle joins
    (SortMergeJoin/ShuffledHashJoin), proving nothing in the plan
    REQUIRES a broadcastable model. Results stay identical to the
    broadcast route."""
    uni, bi = model
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b a b a")], "doc_id int, text string"
    )
    want = sorted(
        map(tuple, T.bigram_lm_score(docs, uni, bi).collect())
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        scored = T.bigram_lm_score(docs, uni, bi, broadcast_model=False)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
        # the only broadcast left is the deliberate 1-row V hint
        assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
        assert sorted(map(tuple, scored.collect())) == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_thin_bigram_lm_prune_and_one_sided_bound(spark, model):
    """Min-count prune: kept rows exact, dropped rows score as
    unseen — pruned ppl >= exact ppl for EVERY doc, equal for docs
    whose bigrams are all kept."""
    uni, bi = model
    uni_t, bi_t = T.thin_bigram_lm(uni, bi, min_count=2)
    assert {(r.w1, r.w2, r.c12) for r in bi_t.collect()} == {("a", "b", 2)}
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "b a"), (12, "z z z"), (13, "a")],
        "doc_id int, text string",
    )
    exact = {
        r.doc_id: r.ppl
        for r in T.bigram_lm_score(docs, uni, bi, alpha=0.5).collect()
    }
    pruned = {
        r.doc_id: r.ppl
        for r in T.bigram_lm_score(docs, uni_t, bi_t, alpha=0.5).collect()
    }
    # all-kept doc: identical; dropped-bigram doc: strictly higher;
    # all-OOV doc: identical (was already unseen); <2 tokens: NULL
    assert pruned[10] == exact[10]
    assert pruned[11] > exact[11]
    assert pruned[12] == exact[12]
    assert pruned[13] is None and exact[13] is None
    for d in (10, 11, 12):
        assert pruned[d] >= exact[d]


def test_cms_scoring_one_sided_and_tight_when_collision_free(spark, model):
    """CMS route: ppl_cms <= ppl_exact for every doc (the sketch only
    over-counts), and with a wide sketch (no collisions on a tiny
    vocab) the scores are bit-identical to the exact route."""
    uni, bi = model
    ref = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id int, text string"
    )
    sk = T.cms_bigram_sketch(ref, width=4096)
    docs = spark.createDataFrame(
        [(10, "a b a b"), (11, "b a c"), (12, "z q"), (13, "a")],
        "doc_id int, text string",
    )
    exact = {
        r.doc_id: (r.n_bigrams, r.xent_bits, r.ppl)
        for r in T.bigram_lm_score(docs, uni, bi, alpha=0.5).collect()
    }
    cms = {
        r.doc_id: (r.n_bigrams, r.xent_bits, r.ppl)
        for r in T.bigram_lm_score_cms(docs, uni, sk, alpha=0.5).collect()
    }
    assert cms == exact  # collision-free width -> exact counts
    # collision-prone width: the inequality must still hold one-sided
    sk2 = T.cms_bigram_sketch(ref, width=2, depth=2)
    cms2 = {
        r.doc_id: r.ppl
        for r in T.bigram_lm_score_cms(docs, uni, sk2, alpha=0.5).collect()
    }
    for d in (10, 11, 12):
        assert cms2[d] <= exact[d][2] + 1e-9, d


def test_cms_score_plan_has_no_bigram_join_shuffle(spark, model):
    """The point of the CMS route: the gram stream joins ONLY the
    broadcast unigram table — no shuffle exchange keyed by the gram
    pair, no Python, one aggregate exchange (the per-doc groupBy)."""
    uni, _ = model
    ref = spark.createDataFrame([(1, "a b a b")], "doc_id int, text string")
    sk = T.cms_bigram_sketch(ref, width=1024)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = T.bigram_lm_score_cms(docs, uni, sk)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "SortMergeJoin" not in plan
    import re

    # the CMS route must never shuffle on the bigram key — the model
    # is a single broadcast row, not a join side
    assert "Exchange hashpartitioning(w1" not in plan
    parts = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    # the corpus stream shuffles exactly once (the per-doc groupBy);
    # every other exchange keys the tiny model/sketch build side
    assert parts.count("doc_id") == 1, parts
    assert set(parts) <= {"doc_id", "w", "row"}, parts


def test_arrow_score_parity_and_plan(spark, model):
    """bigram_lm_score_arrow: byte-identical rows to the native route
    (tokenizer mirrors Spark's trim-spaces + Java-\\s split; HALF_UP
    rounding) on the real documents table under both the full and the
    thinned reference model, with a plan containing ZERO Exchange and
    ZERO join — the corpus is scanned once through one Arrow pass.
    Measured 1.35-1.54x over the native broadcast-join route at
    sf10-sf100 (SCALING.md r09)."""
    uni, bi = model
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 7 == 3)
    for u, b in [
        T.train_bigram_lm(ref),
        T.thin_bigram_lm(*T.train_bigram_lm(ref), min_count=2),
        (uni, bi),  # tiny synthetic model: all-unseen corpus grams
    ]:
        native = {tuple(r) for r in T.bigram_lm_score(docs, u, b).collect()}
        arrow = {
            tuple(r) for r in T.bigram_lm_score_arrow(docs, u, b).collect()
        }
        assert arrow == native
    out = T.bigram_lm_score_arrow(docs, u, b)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_arrow_score_null_and_short_docs(spark, model):
    """The no-signal contract matches the native route exactly: NULL
    text and <2-token docs yield n_bigrams=0 with NULL scores."""
    uni, bi = model
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one"), (4, "  a   b  ")],
        "doc_id long, text string",
    )
    native = {tuple(r) for r in T.bigram_lm_score(docs, uni, bi).collect()}
    arrow = {
        tuple(r) for r in T.bigram_lm_score_arrow(docs, uni, bi).collect()
    }
    assert arrow == native
    byid = {r[0]: r for r in arrow}
    assert byid[1][1] == 0 and byid[1][2] is None
    assert byid[3][1] == 0
    assert byid[4][1] == 1


def test_ppl_column_parity(spark, model):
    """bigram_lm_ppl_column (r11): the per-row COLUMN route shares
    _score_text_batch with the arrow frame route, so its ppl must be
    byte-identical to BOTH routes per doc — including real SQL NULL
    (not NaN) for no-signal docs — and its plan must contain zero
    Exchange and zero Join (the whole point: a ppl-band filter with
    no join-back)."""
    uni, bi = model
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    edge = spark.createDataFrame(
        [(800001, None), (800002, ""), (800003, "one"),
         (800004, "  a   b  ")],
        "doc_id long, text string",
    )
    for u, b in [
        T.train_bigram_lm(docs.filter(F.col("doc_id") % 7 == 3)),
        (uni, bi),
    ]:
        corpus = docs.unionByName(edge)
        want = {
            r.doc_id: r.ppl
            for r in T.bigram_lm_score(corpus, u, b).collect()
        }
        out = corpus.select(
            "doc_id",
            T.bigram_lm_ppl_column(
                F.col("text"), u, b, spark=spark
            ).alias("ppl"),
        )
        got = {r.doc_id: r.ppl for r in out.collect()}
        assert got == want
        assert got[800001] is None and got[800003] is None  # NULL, not NaN
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_lm_impl_auto_routing(spark, model):
    """bigram_lm_score(impl=...) — the gopher impl="auto" precedent
    applied to LM scoring (round 10): auto resolves to the Arrow
    one-pass in the broadcast-model regime and is byte-identical to
    the native route there; auto under broadcast_model=False keeps
    the native shuffle-join plan (a corpus-scale model must never be
    collected), and impl="arrow" under broadcast_model=False is
    rejected outright."""
    uni, bi = model
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    assert T.pick_lm_impl(True) == "arrow"
    assert T.pick_lm_impl(False) == "native"

    native = {
        tuple(r)
        for r in T.bigram_lm_score(docs, uni, bi, impl="native").collect()
    }
    auto = {
        tuple(r)
        for r in T.bigram_lm_score(docs, uni, bi, impl="auto").collect()
    }
    assert auto == native
    # auto in the broadcast regime IS the arrow plan: no join, no
    # exchange. Round 14: "auto" is also the DEFAULT — assert the
    # bare call gets the same plan shape.
    for kw in ({"impl": "auto"}, {}):
        plan = (
            T.bigram_lm_score(docs, uni, bi, **kw)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan and "Exchange" not in plan

    # corpus-scale regime: auto keeps the native join route
    plan_na = (
        T.bigram_lm_score(docs, uni, bi, broadcast_model=False, impl="auto")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" in plan_na

    with pytest.raises(ValueError, match="broadcast_model=False"):
        T.bigram_lm_score(docs, uni, bi, broadcast_model=False, impl="arrow")
    with pytest.raises(ValueError, match="unknown impl"):
        T.bigram_lm_score(docs, uni, bi, impl="sideways")


def test_half_up4_decimal_ties_match_spark(spark):
    """The Arrow route's rounding on decimal-tie values (ADVICE r09):
    values whose shortest-decimal repr ends in an exact 5 at the 5th
    place must round exactly as Spark's F.round (BigDecimal
    shortest-decimal HALF_UP), including cases where the binary
    product x*1e4 falls just UNDER the .5 tie. Battery = crafted ties
    + a dense grid of k/2e4 grid points."""
    import numpy as np

    from wroclaw_bike_stats_spark.operators.text import _half_up4

    ties = [0.00005, 0.00015, 0.12345, 1.00005, 2.57685, 33.33335,
            7.00015, 0.99995]
    grid = [round(k / 2e4, 5) for k in range(1, 4001, 7)]
    vals = [float(v) for v in ties + grid]
    sdf = spark.createDataFrame(
        [(v,) for v in vals], "x double"
    ).select("x", F.round(F.col("x"), 4).alias("r"))
    want = {r.x: r.r for r in sdf.collect()}

    got = _half_up4(np.asarray(vals, dtype=np.float64))
    bad = [
        (v, g, want[v]) for v, g in zip(vals, got) if g != want[v]
    ]
    assert not bad, bad[:5]
    # the naive vectorized form alone would NOT match on at least one
    # tie in this battery — proves the Decimal branch is load-bearing
    naive = np.floor(np.asarray(vals) * 1e4 + 0.5) / 1e4
    assert any(n != want[v] for v, n in zip(vals, naive)), (
        "battery has no binary-crossing tie; strengthen it"
    )

    # the scalar twin (_half_up4_s — the repetition filter's segment
    # rounding, ADVICE r13) must match the same battery, including
    # the dyadic halves where Python round() (HALF_EVEN) diverges
    from wroclaw_bike_stats_spark.operators.text import _half_up4_s

    dyadic = [1 / 32, 3 / 32, 5 / 32, 1 / 16]  # 0.03125 -> 0.0313 ...
    sdf2 = spark.createDataFrame(
        [(v,) for v in vals + dyadic], "x double"
    ).select("x", F.round(F.col("x"), 4).alias("r"))
    want2 = {r.x: r.r for r in sdf2.collect()}
    bad_s = [
        (v, _half_up4_s(v), want2[v])
        for v in vals + dyadic
        if _half_up4_s(v) != want2[v]
    ]
    assert not bad_s, bad_s[:5]
    assert round(1 / 32, 4) != _half_up4_s(1 / 32), (
        "battery no longer distinguishes HALF_EVEN - strengthen it"
    )
