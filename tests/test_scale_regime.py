"""Non-broadcast-regime plan-shape tests (VERDICT r4 item 1, CI half).

PLANS.md's caveat was that at sf0.01–0.1 every join small enough
broadcasts, so the sort-merge/skew machinery the 100-TB story depends on
had never been exercised. tools/scale_regime.py executes the full catalog
at sf1 (K=10 fixtures) and records BENCH_sf1.json; these tests pin the
same two regime transitions at sf0.01 so a regression is caught by the
ordinary suite, without the sf1 fixtures or a long run:

  1. with ``spark.sql.autoBroadcastJoinThreshold=-1`` the fact-fact
     queries execute (collect, not just explain) and their AQE-FINAL
     plans contain a shuffled join (SortMergeJoin/ShuffledHashJoin) and
     no auto-injected BroadcastHashJoin beyond the explicitly hinted
     fixed-size dims;
  2. AQE's skew-join split actually engages (``skew=true`` in the final
     plan) on a planted-skew fact join when the thresholds are scaled to
     local volume at production ratios.

Everything runs on the shared session; broadcast/AQE confs are restored
even on failure so the rest of the suite keeps its normal regime.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark import registry
from codegraphdb_spark.session import clear_session_caches
from codegraphdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"

# Fact-fact representatives from tools/scale_regime.py's FACT_JOIN list —
# one per join flavor (inner agg, multi-way, semi, anti, windowed top-k).
# (name, min shuffled joins, allowed BroadcastHashJoins). The allowance is
# exactly the query's EXPLICITLY hinted fixed-size dims (nation/region via
# load_table + F.broadcast) — with auto-broadcast off, hints are the only
# way a BHJ can appear, so "≤ hinted count" proves nothing leaked.
REPRESENTATIVES = [
    ("revenue_by_nation", 2, 2),            # li⋈o, ⋈c shuffled; nation+region hinted
    ("join_part_supplier_lineitem", 2, 0),  # li⋈part, ⋈supplier
    ("semi_join_active_customers", 1, 0),   # LeftSemi customer⋈orders
    ("anti_join_dormant_customers", 1, 0),  # LeftAnti customer⋈orders
    ("shipping_priority_topk", 2, 0),       # c⋈o, ⋈li
]


@contextlib.contextmanager
def _conf(spark, **kv):
    saved = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, str(v))
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, "expected an AQE-finalized executed plan"
    # AdaptiveSparkPlan.toString() appends "== Initial Plan ==" after the
    # finalized tree — feature counts must only see the final section.
    return plan.split("== Initial Plan ==")[0]


NOBROADCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.mark.parametrize("name,min_shuffled,hinted_bhj", REPRESENTATIVES)
def test_fact_join_plans_shuffled_without_broadcast(spark, name, min_shuffled, hinted_bhj):
    registry.load_all()
    with _conf(spark, **NOBROADCAST):
        clear_session_caches(spark)
        df = registry.QUERIES[name](spark, SF)
        rows = df.collect()
        plan = _final_plan(df)
    clear_session_caches(spark)
    assert len(rows) >= 1
    shuffled = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert shuffled >= min_shuffled, (
        f"{name}: expected >={min_shuffled} shuffled joins in nobroadcast "
        f"regime, got {shuffled}:\n{plan}"
    )
    assert plan.count("BroadcastHashJoin") <= hinted_bhj, (
        f"{name}: auto-broadcast leaked through threshold=-1 "
        f"(> {hinted_bhj} hinted):\n{plan}"
    )


def test_aqe_skew_split_engages_on_planted_skew(spark):
    """Planted-skew probe, sf0.01 edition of tools/scale_regime.skew_probe:
    25% of lineitem funneled onto one join key, md5 payload so compressed
    shuffle bytes track rows (AQE's detector is byte-based), thresholds
    scaled to local volume at the production 4x ratio.

    The left side is repartitioned to 8 tasks first: AQE splits a skewed
    reduce partition by regrouping MAP outputs, so the split granularity
    is one mapper — sf0.01 lineitem scans as a single input partition,
    and a one-mapper skewed partition is unsplittable no matter the
    thresholds (discovered by execution; at sf1 the scan has many input
    splits and no repartition is needed — tools/scale_regime.skew_probe)."""
    with _conf(
        spark,
        **NOBROADCAST,
        **{
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(16 << 10),
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(64 << 10),
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    ):
        li = load_table(spark, SF, "lineitem").repartition(8)
        orders = load_table(spark, SF, "orders")
        hot = li.withColumn(
            "hot_key",
            F.when(F.col("l_orderkey") % 4 == 0, F.lit(1)).otherwise(
                F.col("l_orderkey")
            ),
        ).withColumn(
            "payload",
            F.md5(F.concat_ws(":", "l_orderkey", "l_linenumber", "l_partkey")),
        )
        right = orders.select(F.col("o_orderkey").alias("hot_key"), "o_orderpriority")
        joined = (
            hot.join(right, "hot_key")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.max("payload").alias("pmax"))
        )
        rows = joined.collect()
        plan = _final_plan(joined)
    assert len(rows) == 5
    assert plan.count("skew=true") >= 1, f"skew split did not engage:\n{plan}"
