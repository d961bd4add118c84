"""Scale-regime execution proof (VERDICT r4 item 1).

PLANS.md's caveat: at sf0.01–0.1 every join small enough broadcasts, so
the sort-merge/skew regime the 100-TB claims depend on had been
plan-asserted but never *executed*. This harness runs the relational/
text/events/similarity catalog (everything that scales with sf_dir; the
g_* family runs on the built code graph, whose scale proof lives in
tools/stress_graph.py + the pruned-update bench) against the K=10
fixtures from tools/gen_scale.py, in BOTH regimes:

  * ``nobroadcast`` — ``spark.sql.autoBroadcastJoinThreshold=-1`` (and
    the AQE variant): every non-hinted equi-join must plan shuffled.
    Explicitly hinted dims (region/nation via load_table, the scalar
    probe broadcasts) legitimately stay broadcast — fixed-size at any SF.
  * ``default`` — the session's normal 64 MB threshold, for comparison.

For each query it collects the result (full driver materialization,
BASELINE.md protocol) and captures the **AQE-final executed plan**
(``isFinalPlan=true`` — runtime-finalized, not the pre-execution
estimate), then asserts:

  1. zero query failures in either regime (no OOM / no driver blowup);
  2. every query on the FACT_JOIN list plans ≥1 SortMergeJoin /
     ShuffledHashJoin in the nobroadcast regime — the sort-merge
     transition, demonstrated by execution;
  3. a planted-skew join probe (25% of sf1 lineitem rows funneled onto
     one hot key) shows ``skew=true`` in its final plan with AQE's
     skew-split thresholds at cluster-realistic ratios — proving the
     skew path engages, not just that the config is set.

Writes BENCH_sf1.json at the repo root (both regimes' timings + per-query
plan features + the assertion outcomes) and appends a summary block to
PLANS.md's manual-notes section.

Usage: python tools/scale_regime.py [sf_dir] [--quick]
  --quick: only the FACT_JOIN list + probes (fast iteration).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from codegraphdb_spark import registry  # noqa: E402
from codegraphdb_spark.session import clear_session_caches, get_spark  # noqa: E402
from codegraphdb_spark.sources.tables import load_table  # noqa: E402

# Queries that join fact-scale tables to fact-scale tables: in the
# nobroadcast regime each must show the sort-merge (or shuffled-hash)
# transition in its AQE-final plan.
FACT_JOIN = [
    "revenue_by_nation",
    "join_part_supplier_lineitem",
    "semi_join_active_customers",
    "anti_join_dormant_customers",
    "exists_late_shipment_orders",
    "subquery_small_quantity_revenue",
    "market_share_by_year",
    "returned_item_report",
    "top_revenue_supplier",
    "large_volume_customers",
    "shipping_priority_topk",
    "customer_revenue_concentration",
    "events_funnel",
    # r5: the ingest probe's band join is fact×fact (both sides are
    # stats-less Arrow stages) — must shuffle when broadcasting is off
    "minhash_incremental_candidates",
]

# Fact-scale queries whose plans legitimately show NO shuffled join even
# with broadcasting disabled — each replaces a join with a cheaper shape,
# which is the point, not a gap. Asserted to complete; not SMJ-asserted.
JOIN_FREE_BY_DESIGN = [
    "rolling_7d_customer_revenue",  # RANGE-frame window, one shuffle, 0 joins
    "events_asof_join",             # as-of = union+window sweep (operators/asof.py)
    "doc_dedup_funnel",             # semi/anti joins over cached intermediates
    "doc_decontaminate",            # probe set is an explicit broadcast hint
]


def plan_features(plan: str) -> dict:
    # AdaptiveSparkPlan.toString() prints the final plan followed by
    # "== Initial Plan ==" — count only the runtime-finalized section, or
    # every feature is double-counted.
    final = "isFinalPlan=true" in plan
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "skew_splits": plan.count("skew=true"),
        "exchanges": plan.count("Exchange "),
        "final": final,
    }


def run_catalog(spark, sf_dir: str, names: list[str]) -> tuple[dict, dict, list]:
    timings: dict[str, float] = {}
    plans: dict[str, dict] = {}
    failures: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            n = len(df.collect())
        except Exception as e:  # noqa: BLE001 — the point is "no blowups"
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        timings[name] = round(time.time() - t0, 3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        plans[name] = {**plan_features(plan), "rows": n}
    return timings, plans, failures


def skew_probe(spark, sf_dir: str) -> dict:
    """Planted-skew fact join: hot_key funnels 25% of sf1 lineitem (1.6M
    rows, ~12x the median reduce partition) onto one value, joined to a
    plain orders projection. Must produce ``SortMergeJoin(skew=true)`` —
    AQE's skew split engaging on a real shuffle, not a config assertion.

    Two probe-shape constraints discovered by execution (the reason this
    harness exists):

    * OptimizeSkewedJoin pattern-matches SMJ(Sort(ShuffleStage),
      Sort(ShuffleStage)) — a distinct/aggregate BETWEEN the sort and the
      shuffle on either side silently disables skew handling. The probe's
      right side is therefore a bare projection of orders.
    * Skew stats are COMPRESSED shuffle bytes: a hot partition whose rows
      share the constant hot key (and low-cardinality values) compresses
      ~10x better than the uniform partitions, hiding row-skew from the
      byte-based detector. The probe carries an md5 payload so bytes
      track rows; a production aggregation-heavy pipeline should salt
      BEFORE the shuffle (operators/skew.py) rather than rely on AQE
      seeing compressible skew.

    Thresholds scaled to local volume at the same RATIO production
    defaults use (skew threshold = 4x advisory): advisory 256 KB / skew
    1 MB here ~ 64 MB / 256 MB on a cluster."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    hot = li.withColumn(
        "hot_key",
        F.when(F.col("l_orderkey") % 4 == 0, F.lit(1)).otherwise(F.col("l_orderkey")),
    ).withColumn(
        "payload", F.md5(F.concat_ws(":", "l_orderkey", "l_linenumber", "l_partkey"))
    )
    right = orders.select(F.col("o_orderkey").alias("hot_key"), "o_orderpriority")
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(256 << 10))
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            str(1 << 20),
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        t0 = time.time()
        joined = hot.join(right, "hot_key").groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("q"),
            F.max("payload").alias("pmax"),
        )
        rows = joined.collect()
        wall = round(time.time() - t0, 3)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    f = plan_features(plan)
    return {**f, "rows": len(rows), "wall_sec": wall}


def main() -> None:
    sf_dir = "/root/repo/testdata_sf1"
    quick = "--quick" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        sf_dir = args[0]
    registry.load_all()
    names = (
        FACT_JOIN + JOIN_FREE_BY_DESIGN
        if quick
        else sorted(n for n in registry.QUERIES if not n.startswith("g_"))
    )

    record: dict = {"sf_dir": sf_dir, "k": 10, "base_sf": 0.1, "modes": {}}
    problems: list[str] = []

    for mode in ("nobroadcast", "default"):
        # FRESH session per mode: a single session running ~300 queries
        # accumulates enough heap/codegen-cache pressure to invert some
        # per-mode comparisons (measured: doc_semantic_dedup 131 s in the
        # second mode vs 76 s in the first, restored to the expected
        # ordering in isolated sessions). Restarting makes the two modes'
        # numbers comparable; each still pays its own first-touch costs.
        spark = get_spark(f"scale-regime-{mode}")
        spark.sparkContext.setLogLevel("ERROR")
        if mode == "nobroadcast":
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        else:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        clear_session_caches(spark)
        t0 = time.time()
        timings, plans, failures = run_catalog(spark, sf_dir, names)
        mode_rec = {
            "total_sec": round(sum(timings.values()), 3),
            "wall_sec": round(time.time() - t0, 3),
            "n_queries": len(timings),
            "failures": failures,
            "queries": timings,
            "plans": plans,
        }
        if mode == "nobroadcast":
            mode_rec["skew_probe"] = skew_probe(spark, sf_dir)
        record["modes"][mode] = mode_rec
        problems.extend(f"[{mode}] {f}" for f in failures)
        clear_session_caches(spark)
        spark.stop()

    nb = record["modes"]["nobroadcast"]
    for name in FACT_JOIN:
        p = nb["plans"].get(name)
        if p is None:
            continue  # already a failure above
        if p["smj"] + p["shj"] < 1:
            problems.append(
                f"[nobroadcast] {name}: expected >=1 shuffled join, plan has "
                f"smj={p['smj']} shj={p['shj']} bhj={p['bhj']}"
            )
        if not p["final"]:
            problems.append(f"[nobroadcast] {name}: plan not AQE-finalized")
    sp = nb["skew_probe"]
    if sp["skew_splits"] < 1:
        problems.append(f"skew probe did not engage AQE skew split: {sp}")

    # Bounded-block near-dup growth proof (VERDICT r5 item 2 "Done"):
    # the four r5 weak-for-scale queries must grow wall ≤ ~K·log2(K)
    # from the base SF to the K× fixture (r5 measured 25–57×; the r6
    # kernels + cluster-count-growing fixture measure ≤ ~4×). Fresh
    # session, caches cleared per measurement. Depth-robustness beyond
    # the fixture's block depths is proven separately by
    # tools/stress_deepblock.py (20k-deep single block, exact vs brute).
    neardup = {}
    if not quick:
        import math

        k = 10
        bound = k * math.log2(k)  # ≈ 33×
        spark = get_spark("scale-regime-neardup")
        spark.sparkContext.setLogLevel("ERROR")
        base_dir = "/root/testdata/sf0.1"
        four = [
            "emb_near_dup_pairs",
            "doc_semantic_dedup",
            "simhash_near_dup_pairs",
            "doc_containment_pairs",
        ]
        for q in four:
            registry.QUERIES[q](spark, "/root/testdata/sf0.001").collect()  # warm
        for q in four:
            walls = {}
            rows = {}
            for tag, d in (("base", base_dir), ("k10", sf_dir)):
                clear_session_caches(spark)
                t0 = time.time()
                rows[tag] = registry.QUERIES[q](spark, d).count()
                walls[tag] = round(time.time() - t0, 3)
            ratio = round(walls["k10"] / max(walls["base"], 1e-9), 2)
            neardup[q] = {
                "base_sec": walls["base"],
                "k10_sec": walls["k10"],
                "ratio": ratio,
                "base_rows": rows["base"],
                "k10_rows": rows["k10"],
            }
            if ratio > bound:
                problems.append(
                    f"[neardup] {q}: wall grew {ratio}x at {k}x data "
                    f"(bound ~{bound:.0f}x)"
                )
        # observed block depths at the K× fixture — the engine cap
        # (BLOCK_PAIR_CAP) bounds per-task work regardless; record both
        from codegraphdb_spark.operators.similarity import BLOCK_PAIR_CAP
        from codegraphdb_spark.sources.tables import load_table

        max_label_depth = (
            load_table(spark, sf_dir, "embeddings")
            .groupBy("label")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        neardup["max_label_block_depth"] = int(max_label_depth)
        neardup["block_pair_cap"] = BLOCK_PAIR_CAP
        neardup["deep_block_proof"] = "tools/stress_deepblock.py (20k deep, exact)"
        clear_session_caches(spark)
        spark.stop()
        record["neardup_growth"] = neardup

    record["assertions"] = {
        "fact_join_smj": [n for n in FACT_JOIN if n in nb["plans"]],
        "skew_probe_splits": sp["skew_splits"],
        "neardup_growth_bound": {
            q: v["ratio"] for q, v in neardup.items() if isinstance(v, dict)
        },
        "problems": problems,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_sf1.json"), "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: v for k, v in record["assertions"].items()}, indent=1))
    for mode in ("nobroadcast", "default"):
        m = record["modes"][mode]
        print(
            f"{mode}: {m['n_queries']} queries, total {m['total_sec']}s, "
            f"{len(m['failures'])} failures"
        )
    if problems:
        print("PROBLEMS:")
        for p in problems:
            print(" ", p)
        raise SystemExit(1)
    print("SCALE REGIME OK")


if __name__ == "__main__":
    main()
