"""Plan-shape guards for the round-5 query paths: the properties that make
them scale are asserted on the physical plan, not just implied by the code.
"""

from __future__ import annotations

from codegraphdb_spark import registry


def _plan(spark, sf_dir, name):
    registry.load_all()
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_incremental_candidates_never_self_joins_the_corpus(spark, sf_dir):
    """The probe's whole point: the base corpus is only PROBED — since r6
    it is a PERSISTED bucket table (inc_bands_*), and the plan holds
    exactly TWO equi-joins on (band_idx, band_key): the delta→standing-
    bucket probe and the small delta↔delta self-join. The corpus never
    self-joins and never re-bands (its only appearance is the bucketed
    file scan; tests/test_incremental_probe_plans.py pins that side)."""
    plan = _plan(spark, sf_dir, "minhash_incremental_candidates")
    assert (
        plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin")
        == 2
    ), plan
    assert "inc_bands_" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ivf_probe_is_one_python_scoring_stage(spark, sf_dir):
    """emb_incremental_ivf_probe: centroid distances stay declarative
    (broadcast centroids — fixed k×dim rows at any SF), and the pair
    scoring is EXACTLY ONE Arrow python stage (the per-cell numpy block
    kernel), not a per-pair interpreted fold (no higher-order aggregate
    in the plan) and not one stage per side."""
    plan = _plan(spark, sf_dir, "emb_incremental_ivf_probe")
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    # interpreted zip_with/aggregate folds would appear as lambda-bearing
    # projections; the block kernel replaces them entirely
    assert "zip_with" not in plan.lower(), plan
    assert "BroadcastExchange" in plan, plan  # centroids broadcast
    assert "CartesianProduct" not in plan, plan


def test_distinct_aggs_single_grouping_pipeline(spark, sf_dir):
    """g_cypher_distinct_aggs: all four DISTINCT aggregate forms compile
    into ONE grouped pipeline on the file_path key — Catalyst's distinct
    pre-pass regroups on (group key, distinct col) then re-aggregates,
    bounded exchanges, no join (the merge inputs are the session-cached
    graph, not re-joined per aggregate)."""
    import re

    plan = _plan(spark, sf_dir, "g_cypher_distinct_aggs")
    # the distinct pre-pass: one exchange keyed on BOTH the grouping key
    # and the distinct column (map-side dedup before the final aggregate)
    assert re.search(
        r"hashpartitioning\([^)]*file_path[^)]*code_start", plan
    ), plan
    assert plan.count("Exchange") <= 4, plan
    assert "Join" not in plan, plan


def test_call_procs_are_tiny_distinct_aggregates(spark, sf_dir):
    """g_cypher_call_procs: label/type universes are distinct-aggregates
    over dictionary-encodable columns — no join anywhere, exchanges carry
    only the (bounded) label/type domains."""
    plan = _plan(spark, sf_dir, "g_cypher_call_procs")
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
