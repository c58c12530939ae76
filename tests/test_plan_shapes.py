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
