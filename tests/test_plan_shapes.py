"""Physical-plan shape guards for the relational gate queries: the
optimizer is free to pick strategies, but some shapes are outright
bugs at scale — a CartesianProduct anywhere, or a nested-loop join
that isn't one of the deliberate 1-row scalar-aggregate broadcasts."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

RELATIONAL = [
    "pricing_summary",
    "revenue_topk",
    "region_nation_revenue",
    "topk_customers",
    "large_orders_having",
    "order_count_distribution",
    "promo_revenue_share",
    "order_priority_late",
    "shipping_volume_nations",
    "revenue_rank_by_nation",
    "running_customer_revenue",
    "pivot_priority_status",
    "lineitem_stats",
    "term_df",
]

# scalar-aggregate broadcasts: a 1-row plan joined with no condition
# compiles to BroadcastNestedLoopJoin BY DESIGN — allowed only here.
SCALAR_BROADCAST = [
    "suppliers_above_avg",
    "rich_customers_by_nation",
    "tfidf_top_terms",
]


def _plan(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", RELATIONAL + SCALAR_BROADCAST)
def test_no_cartesian_product(spark, name):
    assert "CartesianProduct" not in _plan(spark, name), name


@pytest.mark.parametrize("name", RELATIONAL)
def test_no_nested_loop_join(spark, name):
    assert "BroadcastNestedLoopJoin" not in _plan(spark, name), name


@pytest.mark.parametrize(
    "name",
    ["revenue_topk", "region_nation_revenue", "shipping_volume_nations",
     "promo_revenue_share", "revenue_rank_by_nation"],
)
def test_dim_joins_are_broadcast(spark, name):
    """Queries with explicit broadcast() on dim sides must compile to
    at least one BroadcastHashJoin (no silent fallback to SMJ for the
    small dimensions)."""
    assert "BroadcastHashJoin" in _plan(spark, name), name


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_project_part")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(p_size)" in plan or "GreaterThan(p_size,20)" in plan


def test_column_pruning_reaches_scan(spark):
    """The lineitem scan for the pricing summary must read only the
    columns the query touches — a ReadSchema carrying all 16 lineitem
    columns for a 7-column aggregation means pruning broke and a
    100 TB scan reads ~2× the bytes it needs."""
    # plan toString truncates metadata (ReadSchema) at 100 chars by
    # default — widen it so the full schema is assertable.
    original = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = _plan(spark, "pricing_summary")
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", original)
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    needed = {
        "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate",
    }
    for c in needed:
        assert c in read_schema, (c, read_schema)
    for c in ("l_orderkey", "l_comment", "l_partkey", "l_suppkey"):
        assert c not in read_schema, (c, read_schema)


# Every queries() entry whose physical plan LEGITIMATELY contains a
# BroadcastNestedLoopJoin, with why. Anything not listed here must
# compile without one — and NOTHING may compile to CartesianProduct.
BNLJ_ALLOWED = {
    # scalar-aggregate broadcasts: a 1-row side joined without keys
    "suppliers_above_avg": "scalar avg broadcast",
    "rich_customers_by_nation": "scalar avg broadcast",
    "tfidf_top_terms": "corpus-size scalar broadcast",
    "range_hist_avg": "n-days scalar divisor broadcast",
    "bigram_lm_ppl": "vocab-size 1-row scalar broadcast (operators/text.py bigram_lm_score V join)",
    "curate_pipeline_full": "embeds bigram_lm_score's vocab-size 1-row scalar broadcast",
    "dsir_scores": "two 1-row gram-total scalar broadcasts (operators/dsir.py dsir_logratio)",
    "dsir_resample": "two 1-row gram-total scalar broadcasts (operators/dsir.py dsir_logratio)",
    "nb_lang_predict": "1-row class-totals + priors scalar broadcasts (operators/classifier.py)",
    "ppl_buckets": "embeds bigram_lm_score's vocab-size 1-row scalar broadcast",
    "ppl_pruned": "embeds bigram_lm_score's vocab-size 1-row scalar broadcast",
    "ppl_cms_bound": "vocab-size 1-row scalar + 1-row dense-CMS broadcast (operators/sketch.py cms_dense)",
    "banded_components_refinement": "1-row edge-stats × 1-row refinement-bool scalar crossJoin (__spark_entry__.py q_banded_components_refinement)",
    "dsir_scheme_consistency": "1-row rank-stats × 1-row resample-overlap scalar crossJoin, plus the dsir_logratio gram-total broadcasts",
    "nb_scheme_consistency": "1-row class-totals + priors scalar broadcasts under BOTH bucket schemes (operators/classifier.py)",
    "profile_orders": "1-row basic × 1-row distinct agg join",
    "temperature_mix": "1-row (N, sum n^alpha) totals scalar broadcast (operators/pipeline.py temperature_mix_rates)",
    "cms_heavy_hitters": "1-row token-total scalar broadcast (the e/w*N error bound)",
    "token_budget": "1-row grand-total scalar broadcast (token_share divisor)",
    # broadcast-literal query fan-out (tiny fixed query set × corpus)
    "embedding_topk": "5 broadcast query vectors × corpus",
    "embedding_topk_ivf": "broadcast query vectors + probe literals",
    "embedding_topk_ivf_indexed": "broadcast query vectors + probe literals",
    "ivf_pca_composed": "broadcast query vectors + probe literals over the PCA projection (same IVF probe shape as embedding_topk_ivf_indexed)",
    # deliberate brute-force verification sides
    "simhash_recall": "O(n²) hamming brute force IS the check",
    "ivf_recall": "exact brute-force side of the recall check",
}


def test_no_accidental_cartesian_or_bnlj_anywhere(spark):
    """Global sweep: every gate query compiles without CartesianProduct,
    and BroadcastNestedLoopJoin appears only in the explicitly
    justified plans above — a new query with an accidental unkeyed
    join fails here before it ever reaches a bench or the driver."""
    queries = entry_mod.queries()
    assert set(BNLJ_ALLOWED) <= set(queries)
    offenders = {}
    for name, fn in queries.items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            offenders[name] = "unjustified BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_salted_join_partitions_on_salt(spark):
    """The salted join must actually change the physical distribution:
    the shuffle/join key set has to include the salt column alongside
    the hot key — otherwise the hot key still lands on one reducer and
    the operator is a no-op with extra cost."""
    plan = _plan(spark, "salted_join_skew")
    assert "_salt" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_profile_expand_is_isolated(spark):
    """Exact profiling compiles the multi-distinct aggregation into
    ONE Expand, and the plain count/min/max aggs stay OUT of it (they
    run in their own agg over the unexpanded stream — the round-4
    2x fix; operators/profile.py docstring)."""
    plan = _plan(spark, "profile_orders")
    assert plan.count("Expand") == 1, plan
    # the split produces two independent HashAggregate chains joined
    # as 1-row frames via a broadcast join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_centroid_assignment_is_narrow(spark):
    """The IVF/k-means assignment must be shuffle-free: a scan plus an
    Arrow-batched argmax against a literal centroid matrix. The r2
    crossJoin+window formulation exchanged the corpus ×num_centroids
    (VERDICT r2 #2) — this pins the fix."""
    from wroclaw_bike_stats_spark.operators import similarity as SIM

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    _, assigned = SIM.ivf_assign(emb, num_centroids=8)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan
