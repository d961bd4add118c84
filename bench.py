"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. The full record — including a
second, warm-cache run per query — is also written to BENCH_local.json
next to this file, so the result survives any stdout truncation.

Wall time is measured around a full collect() of each result (driver
materialization included, matching BASELINE.md's protocol). "queries"
holds the COLD times (first run in the session, comparable to BASELINE.md
and earlier rounds); "queries_warm" in the file holds the repeat run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from codegraphdb_spark import registry  # noqa: E402
from codegraphdb_spark.session import get_spark  # noqa: E402


def _pruned_update_bench(spark, n_pkgs: int) -> dict:
    """Scale validation of the dependency-pruned incremental update
    (VERDICT r3 item 5): build a synthetic ~3·n_pkgs-file monorepo
    (tools/stress_graph.synth_repo — mini-repo shape × N with
    cross-package inheritance), apply a 10-file change, run the FULL
    recompile update and the PRUNED update, ASSERT result-equality
    (exceptAll in both directions on nodes and edges), and report wall
    times + the affected-set size. Reference lifecycle being beaten:
    update_version.py:58-73 (full re-walk per update)."""
    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.operators.incremental import affected_files
    from codegraphdb_spark.sources.repo import files_from_pairs
    from tools.stress_graph import synth_repo

    pairs = synth_repo(n_pkgs)
    eng = GraphEngine(spark)
    t0 = time.time()
    nodes, edges, facts = eng.build(files_from_pairs(spark, pairs), "v1")
    nodes = nodes.localCheckpoint()
    edges = edges.localCheckpoint()
    nodes.count()
    edges.count()
    build_sec = round(time.time() - t0, 3)

    step = max(1, n_pkgs // 10)
    idxs = [i * step for i in range(10) if i * step < n_pkgs]
    change_list = [f"pkg{i:05d}/core.py" for i in idxs]
    changed_pairs = [
        (
            f"pkg{i:05d}/core.py",
            f"LIMIT_{i} = {i + 1000}\n\n"
            f"class Base{i}:\n"
            f"    kind = 'changed'\n"
            f"    def __init__(self):\n        self.state = 9\n"
            f"    def step(self):\n        return LIMIT_{i} + 1\n"
            f"    def reset(self):\n        self.state = 9\n"
            f"    def audit(self):\n        return self.step()\n",
        )
        for i in idxs
    ]
    changed_files = files_from_pairs(spark, changed_pairs)

    t0 = time.time()
    fn, fe, _ = eng.update_version(
        nodes, edges, facts, changed_files, change_list, "v2"
    )
    fn = fn.localCheckpoint()
    fe = fe.localCheckpoint()
    fn.count()
    fe.count()
    full_sec = round(time.time() - t0, 3)

    t0 = time.time()
    pn, pe, facts2 = eng.update_version_pruned(
        nodes, edges, facts, changed_files, change_list, "v2"
    )
    pn = pn.localCheckpoint()
    pe = pe.localCheckpoint()
    pn.count()
    pe.count()
    pruned_sec = round(time.time() - t0, 3)

    aff_df = affected_files(facts2, facts, change_list)
    n_affected = aff_df.count()

    # PERSISTED update (the 100-TB cost that matters): full overwrite
    # rewrites the whole snapshot to flip one version cell per row; the
    # manifest-based incremental writer rewrites only the affected file
    # buckets + a manifest line. Measure wall AND bytes written.
    import shutil
    import tempfile

    def _du(p):
        total = 0
        for root, _, fns in os.walk(p):
            for fn in fns:
                total += os.path.getsize(os.path.join(root, fn))
        return total

    tmp = tempfile.mkdtemp(prefix="bench_snap_")
    try:
        base = os.path.join(tmp, "snap")
        eng.write_snapshot_incremental_base(nodes, edges, base)
        base_bytes = _du(base)

        t0 = time.time()
        eng.write_snapshot(fn, fe, os.path.join(tmp, "full_v2"))
        full_write_sec = round(time.time() - t0, 3)
        full_write_bytes = _du(os.path.join(tmp, "full_v2"))

        aff_list = [r["file_path"] for r in aff_df.collect()]
        t0 = time.time()
        eng.write_snapshot_update(pn, pe, base, "v2", aff_list)
        pruned_write_sec = round(time.time() - t0, 3)
        pruned_write_bytes = _du(base) - base_bytes
        # hard gate: the manifest read must reproduce the merged frames
        rn, re_ = eng.read_snapshot_incremental(base)
        cols_n = sorted(pn.columns)
        cols_e = sorted(pe.columns)
        for label, a, b in (
            ("snap nodes", rn.select(*cols_n), pn.select(*cols_n)),
            ("snap nodes rev", pn.select(*cols_n), rn.select(*cols_n)),
            ("snap edges", re_.select(*cols_e), pe.select(*cols_e)),
            ("snap edges rev", pe.select(*cols_e), re_.select(*cols_e)),
        ):
            diff = a.exceptAll(b)
            if not diff.isEmpty():
                raise AssertionError(
                    f"incremental snapshot != merged on {label}: "
                    f"{diff.limit(3).collect()}"
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # correctness gate, not just a timing: the pruned path must be
    # result-equal to the full recompile AT THIS SCALE
    for label, a, b in (
        ("nodes", fn, pn),
        ("nodes", pn, fn),
        ("edges", fe, pe),
        ("edges", pe, fe),
    ):
        diff = a.exceptAll(b)
        if not diff.isEmpty():
            raise AssertionError(
                f"pruned != full on {label}: {diff.limit(3).collect()}"
            )

    return {
        "files": len(pairs),
        "changed_files": len(change_list),
        "affected_files": n_affected,
        "build_sec": build_sec,
        "full_update_sec": full_sec,
        "pruned_update_sec": pruned_sec,
        "full_persist_sec": round(full_sec + full_write_sec, 3),
        "pruned_persist_sec": round(pruned_sec + pruned_write_sec, 3),
        "full_write_bytes": full_write_bytes,
        "pruned_write_bytes": pruned_write_bytes,
        "result_equal": True,
        "snapshot_roundtrip_equal": True,
    }


# Queries whose RESULT is corpus-sized (>=20k rows at sf0.1, measured
# tools-side 2026-08: simhash pairs 272k, windowed/event families 20k-150k
# — or corpus-wide payload columns like the span scrub's full texts). For
# these, a full driver collect() measures result serialization, not the
# plan: at the K=100 fixture events_json_extract's wall was dominated by
# collecting ~half the events table (BENCH_k100_full note). Bench mode
# 'hash': execute the identical plan but reduce to (xxhash64 sum, count)
# — one extra reduce stage, zero driver transfer — and record the mode
# per query in the BENCH record so medians are compared like-for-like.
EMIT_ALL_QUERIES = {
    "simhash_near_dup_pairs",
    "window_rank_lag_running",
    "rolling_7d_customer_revenue",
    "emb_whiten",
    "events_ewma",
    "events_cusum_drift",
    "events_anomaly_zscore",
    "events_sessionization",
    "scan_filter_project",
    "events_json_extract",
    "events_gap_fill_locf",
    "events_time_weighted_avg",
    "join_part_supplier_lineitem",
    "events_tumbling_window",
    "events_asof_join",
    "filter_prefix_isin",
    "doc_dup_span_scrub",  # row-wide: full scrubbed document texts
}


# Query FAMILIES sharing one session-cached materialization (VERDICT r10
# item 8): the first family member the sweep reaches pays the shared
# checkpoint/table-assembly cost inside ITS cold timer, so sampling one
# member without the rest misgrades cost-shifting as speedup (r10's
# minhash_lsh_candidates "6.79x"). Emitted with every BENCH record so
# PERF can sample families together or aggregate family subtotals.
# Membership = consumers of one _*_CACHE dict in queries/text.py /
# queries/similarity.py (single-consumer caches omitted).
QUERY_FAMILIES = {
    "jaccard_pairs": [  # text._PAIRS_CACHE
        "ngram_jaccard_pairs", "doc_dup_clusters",
        "doc_dedup_keep_best", "doc_dedup_funnel",
    ],
    "lsh_candidates": [  # text._LSH_CAND_CACHE
        "minhash_lsh_candidates", "doc_minhash_jaccard_est",
    ],
    "dup_spans": [  # text._SPANS_CACHE (assembled from dup_pos_)
        "doc_dup_spans", "doc_dup_span_stats",
        "doc_dup_span_scrub", "doc_dedup_funnel",
    ],
    "emb_near_dup": [  # similarity._EMB_PAIRS_CACHE
        "emb_near_dup_pairs", "emb_dup_clusters", "doc_semantic_dedup",
    ],
    "pq_coded": [  # similarity._pq_coded checkpoint
        "emb_pq_encode", "emb_pq_topk",
    ],
}


def run_measured(df, name: str):
    """Execute a query for timing: emit-all queries reduce to a content
    digest + count (same plan, no driver transfer); everything else
    collects like a client would. Returns the mode used.

    Only ANALYSIS-time failures (an unhashable column type) fall back to
    collect — those fail before any execution, so the timed run is a
    clean collect. A RUNTIME failure propagates (ADVICE r9): swallowing
    it would time a partially executed hash attempt plus a full collect
    and silently flip the recorded mode."""
    from pyspark.sql import functions as F
    from pyspark.errors import AnalysisException

    if name in EMIT_ALL_QUERIES:
        try:
            # bit_xor: order-insensitive, cannot overflow under ANSI mode
            df.select(
                F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).collect()
            return "hash"
        except AnalysisException:
            df.collect()
            return "collect_fallback_analysis"
    df.collect()
    return "collect"


def host_probe() -> float:
    """Fresh-page allocation cost in ms/MB (healthy < 1; the r8/r9
    hypervisor incident read 6-126). A single 250 MB numpy allocation —
    cheap enough to run BEFORE AND AFTER the sweep (VERDICT r9 item 1:
    the start-of-run probe predicted neither the driver's 192.9s nor the
    builder's 135.4s on identical code; only a bracket can tell
    mid-run degradation from a plan change)."""
    import numpy as np

    t0 = time.time()
    buf = np.ones(250_000_000 // 8)
    ms_per_mb = round((time.time() - t0) / 250 * 1000, 2)
    del buf
    return ms_per_mb


HOST_HEALTHY_MS_PER_MB = 2.0  # builder probe scale: healthy < 1, margin 2x


def host_suspect(before: float, after: float) -> bool:
    """A bench record is host-suspect when either bracket probe reads
    degraded, or the two diverge by >4x (the host changed state mid-run
    — per-query ratios are then not comparable to healthy medians)."""
    if before > HOST_HEALTHY_MS_PER_MB or after > HOST_HEALTHY_MS_PER_MB:
        return True
    lo, hi = min(before, after), max(before, after)
    return lo > 0 and hi / lo > 4.0


def ratio_only_hit(sec: float, baseline: float) -> bool:
    """>1.5x its median but under the graded absolute floor — the class
    that can repeat forever without flagging (VERDICT r9 item 7:
    date_parts_orders / doc_token_stats read >1.5x in two independent
    sessions, each time dismissed as sub-floor jitter)."""
    return (
        baseline >= 0.05
        and sec > 1.5 * baseline
        and not is_regression(sec, baseline)
    )


def is_regression(sec: float, baseline: float) -> bool:
    """Graded regression gate (unit-tested in tests/test_bench_gate.py).

    Ratio AND absolute floor: a single cold run jitters sub-second
    queries by 1.5-2x routinely (measured: two back-to-back full runs
    flagged 15 vs 3 queries on pure ratio, almost all <0.4s moves) — a
    flag should mean a move big enough to re-measure, not JIT/cold
    noise. Graded floor (ADVICE r7, pinned r9): the flat 0.4s floor hid
    big regressions in fast queries (0.1s -> 0.45s is 4.5x but only
    +0.35s), so extreme ratios (>3x) get the lower 0.2s floor.
    Sub-50ms baselines are pure noise and never bind."""
    if baseline < 0.05:
        return False
    return (sec > 1.5 * baseline and sec - baseline >= 0.4) or (
        sec > 3.0 * baseline and sec - baseline >= 0.2
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # tolerate any fixture naming (sf0.1, testdata_sf10, k100_docs...):
    # take the trailing number of the basename, else mark sf unknown
    import re

    m = re.search(r"(\d+(?:\.\d+)?)$", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else -1.0
    # Host-state probe (r8): after hours of heavy runs this VM's
    # hypervisor served FRESH pages at up to 64 ms/MB (healthy: <1),
    # making every JVM 3-5x slower while raw CPU/syscalls/sequential IO
    # stayed normal — a broad cross-query "regression" with no code
    # cause. Record the fault rate with every bench run so a BENCH
    # record carries its own host-state evidence and a degraded-host
    # run is never mistaken for a plan regression.
    host_alloc_ms_per_mb = host_probe()

    registry.load_all()
    spark = get_spark("codegraphdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # queries, not session bring-up (cold session per BASELINE.md protocol —
    # the session itself IS cold; only codegen/worker bring-up is warmed).
    registry.QUERIES["revenue_by_nation"](spark, sf_dir).collect()
    from pyspark.sql import functions as F

    spark.range(2).select(
        F.regexp_replace(F.to_json(F.struct("id")), "1", "2"),
        F.get_json_object(F.lit('{"a":1}'), "$.a"),
    ).collect()  # regex/json expression-class codegen (g_code_hydration path)
    # string/array scalar-fn expression classes (upper/size/coalesce/
    # substring/replace — the g_cypher_scalar_fns projection): one-time
    # Janino compilation measured at ~1.1s of that query's 1.34s cold
    # time (0.16s warm). Same bring-up class as the regex/json warmup
    # above — declared in OPTIMIZATION_r10.md (protocol note), old
    # numbers retained in BASELINE_QUERIES.json's fallback column.
    spark.range(2).select(
        F.upper(F.col("id").cast("string")),
        F.size(F.array(F.lit("a"))),
        F.coalesce(F.col("id").cast("string"), F.lit("x")),
        F.substring(F.col("id").cast("string"), 0, 4),
        F.expr("replace(cast(id as string), 'o', '0')"),
    ).collect()
    # Python worker POOL bring-up: one row per core so every reusable
    # worker process is spawned (and pandas imported) before any measured
    # query — range(2) only warmed 1-2 workers and the first wide Arrow
    # stage paid the other ~30 spawns inside its own timing
    par = spark.sparkContext.defaultParallelism
    spark.range(par).repartition(par).mapInPandas(
        lambda it: it, "id LONG"
    ).collect()

    # pruned-update scale validation (~6k files, 10-file change) — set
    # SPARK_GRAFT_PRUNED_PKGS=0 to skip while iterating locally. Measured
    # BEFORE the catalog sweep: lifecycle jobs are many tiny stages, and
    # the sweep leaves hundreds of pinned checkpoint blocks whose heap
    # pressure inflates exactly that stage shape (measured 8.7 s pristine
    # vs 18.5 s after 171 queries even WITH clear_session_caches — the
    # JVM's ContextCleaner releases blocks asynchronously, so clearing at
    # that point can't restore a pristine heap). A real incremental update
    # runs in its own session; the pristine measurement is the honest one.
    pruned_pkgs = int(os.environ.get("SPARK_GRAFT_PRUNED_PKGS", "2000"))
    if pruned_pkgs > 0:
        pruned_rec = _pruned_update_bench(spark, pruned_pkgs)
        import gc

        gc.collect()  # let ContextCleaner reclaim the synthetic graph
    else:
        pruned_rec = None

    # The code-graph snapshot is built once per session (a lifecycle job,
    # not a query); time it separately so g_* timings measure query latency.
    from codegraphdb_spark.queries.graph import _graph

    t0 = time.time()
    _graph(spark)
    # one hydration pass warms the column-pattern-regex/json codegen classes
    # (first compilation costs ~5s regardless of data size)
    registry.QUERIES["g_code_hydration"](spark, sf_dir).collect()
    graph_build_sec = round(time.time() - t0, 3)

    # Standing index tables are likewise one-time lifecycle builds (a
    # production pipeline shingles/bands/quantizes the corpus at indexing
    # time, not per query): build them here and report the cost as its own
    # metric, so per-query numbers measure the PROBE — the recurring cost —
    # not the index build it amortizes (VERDICT r6 item 5). Queries still
    # build them on demand when run standalone.
    from codegraphdb_spark.queries.similarity import (
        _standing_full_cent,
        _standing_ivf_tables,
    )
    from codegraphdb_spark.queries.text import (
        _shingle_sets,
        _standing_band_table,
        _standing_dup_pos,
        _standing_minhash_sigs,
        _standing_overlap_index,
        _standing_simhash60,
    )

    t0 = time.time()
    _shingle_sets(spark, sf_dir)  # r10: persisted standing table
    _standing_dup_pos(spark, sf_dir)  # r11: duplicated-gram position index
    _standing_overlap_index(spark, sf_dir)
    _standing_minhash_sigs(spark, sf_dir)
    _standing_band_table(spark, sf_dir)
    _standing_simhash60(spark, sf_dir)
    _standing_ivf_tables(spark, sf_dir)
    _standing_full_cent(spark, sf_dir)  # r10: full-corpus coarse quantizer
    standing_index_build_sec = round(time.time() - t0, 3)

    # Sweep heap hygiene (VERDICT r7 item 2): most queries localCheckpoint
    # ephemeral intermediates; the Python refs die when the query returns,
    # but the pinned blocks are only released once the JVM's ContextCleaner
    # sees the RDD object collected. Left to its own cadence, ~190 queries
    # of orphaned blocks accumulate and the late-alphabet sweep rows pay
    # the heap pressure (BENCH_r07 flagged 6 rows with zero plan changes
    # that all ran ~1.2x warm). Periodically collect Python-side (drops
    # py4j refs) then JVM-side (System.gc() makes ContextCleaner's weak
    # references enqueue and the blocks drop synchronously enough), OUTSIDE
    # the per-query timers. The session cache dicts (_OVERLAP_CACHE etc.)
    # keep their strong refs, so family-shared intermediates survive and
    # timings stay comparable with the in-sweep-measured medians.
    import gc

    def _heap_hygiene() -> None:
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    hygiene_every = int(os.environ.get("SPARK_GRAFT_HYGIENE_EVERY", "20"))
    # Gate validation hook (VERDICT r9 item 1): "name:factor" stretches
    # that one query's timed window to factor x its measured wall by
    # sleeping inside the timer — a deliberate planted slowdown that the
    # regression report MUST flag. Never set outside gate validation;
    # the record carries the plant so a planted run can't be mistaken
    # for a measurement.
    plant = os.environ.get("SPARK_GRAFT_PLANT_SLOWDOWN")
    plant_name, plant_factor = None, 1.0
    if plant:
        plant_name, _f = plant.rsplit(":", 1)
        plant_factor = float(_f)
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    modes: dict[str, str] = {}
    for i, (name, fn) in enumerate(sorted(registry.QUERIES.items())):
        if i % hygiene_every == 0:
            _heap_hygiene()
        t0 = time.time()
        modes[name] = run_measured(fn(spark, sf_dir), name)
        if name == plant_name:
            time.sleep((plant_factor - 1.0) * (time.time() - t0))
        timings[name] = round(time.time() - t0, 3)
        t0 = time.time()
        run_measured(fn(spark, sf_dir), name)
        warm[name] = round(time.time() - t0, 3)

    host_alloc_after = host_probe()
    total = round(sum(timings.values()), 3)

    # Per-query regression table vs the committed median baseline
    # (BASELINE_QUERIES.json, produced by tools/rebaseline.py — VERDICT r6
    # item 2): every query >1.5× its median-of-3 cold baseline is named,
    # so a round's BENCH record carries its own regression evidence
    # instead of relying on eyeballing two single cold runs.
    regressions: dict[str, dict] = {}
    confirm_reruns: dict[str, float] = {}
    baseline_total = None
    bq_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_QUERIES.json"
    )
    if os.path.exists(bq_path) and not os.environ.get(
        "SPARK_GRAFT_NO_REGRESSION_REPORT"
    ):
        with open(bq_path) as fh:
            bq = json.load(fh)
        base_q = bq.get("queries", {})
        if bq.get("sf_dir") == sf_dir:  # medians only bind at their own SF
            baseline_total = round(
                sum(v for k, v in base_q.items() if k in timings), 3
            )
            for name, sec in timings.items():
                b = base_q.get(name)
                if not b:
                    continue
                if is_regression(sec, b):
                    regressions[name] = {"sec": sec, "baseline": b,
                                         "ratio": round(sec / b, 2)}
                elif ratio_only_hit(sec, b):
                    # one immediate re-execution (VERDICT r9 item 7): a
                    # sub-floor >1.5x reading is usually cold jitter, but
                    # one that REPEATS in the same session is a real
                    # constant-factor move the absolute floor would hide
                    # forever — flag the repeat, floor notwithstanding
                    t0 = time.time()
                    run_measured(registry.QUERIES[name](spark, sf_dir), name)
                    rr = round(time.time() - t0, 3)
                    confirm_reruns[name] = rr
                    if rr > 1.5 * b:
                        regressions[name] = {
                            "sec": sec, "rerun_sec": rr, "baseline": b,
                            "ratio": round(sec / b, 2),
                            "ratio_only_confirmed": True,
                        }

    record = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "baseline_total_sec": baseline_total,
        "regressions_vs_baseline": regressions,
        "graph_build_sec": graph_build_sec,
        "standing_index_build_sec": standing_index_build_sec,
        "sf": sf,
        "cold": True,  # "queries" are first-run-in-session times
        "host_fresh_alloc_ms_per_mb": host_alloc_ms_per_mb,
        "host_fresh_alloc_ms_per_mb_after": host_alloc_after,
        # either bracket probe degraded, or >4x divergence: per-query
        # ratios in this record are not comparable to healthy medians
        "host_suspect": host_suspect(host_alloc_ms_per_mb, host_alloc_after),
        "confirm_reruns": confirm_reruns,
        "planted_slowdown": plant,
        # emit-all queries measured as (xxhash64 sum, count) reduces, not
        # driver collects (VERDICT r8 item 6) — the mode each row used
        "bench_mode_hash": sorted(k for k, v in modes.items() if v == "hash"),
        "queries_warm": warm,
        # family map (VERDICT r10 item 8): queries sharing one session
        # materialization — sample together or aggregate subtotals
        "families": QUERY_FAMILIES,
        "family_cold_totals": {
            fam: round(sum(timings.get(q, 0.0) for q in qs), 3)
            for fam, qs in QUERY_FAMILIES.items()
        },
        "warm_total_sec": round(sum(warm.values()), 3),
        "pruned_update": pruned_rec,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_local.json"), "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # Full per-query line first, for consumers that keep whole stdout.
    slim = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cold": True,
        "host_alloc": host_alloc_ms_per_mb,
        "host_alloc_after": host_alloc_after,
        "host_suspect": host_suspect(host_alloc_ms_per_mb, host_alloc_after),
        "graph_build_sec": graph_build_sec,
        "standing_index_build_sec": standing_index_build_sec,
        "bench_file": "BENCH_local.json",
        "pruned_update": pruned_rec,
        "baseline_total_sec": baseline_total,
        "regressions_vs_baseline": {
            k: v["ratio"] for k, v in regressions.items()
        },
        "bench_mode_hash": sorted(k for k, v in modes.items() if v == "hash"),
        "queries": {k: round(v, 2) for k, v in timings.items()},
    }
    print(json.dumps(slim, separators=(",", ":")))
    # The driver's round record keeps only the LAST ~2 KB of stdout, which
    # front-truncated the line above every round (BENCH_r*.json parsed:
    # null — VERDICT r4 item 10). End stdout with a self-contained line
    # guaranteed to fit that window: named timings for the BASELINE.md
    # headline queries, plus ALL per-query cold times as "t_cs"
    # (centiseconds, array-aligned with the registry's sorted query names
    # — reconstruct via dict(zip(sorted(queries), t_cs))); full
    # float-precision numbers live in BENCH_local.json.
    headline = [
        "revenue_by_nation", "pricing_summary", "ngram_jaccard_pairs",
        "doc_dup_clusters", "doc_tfidf_top_terms",
        "rolling_7d_customer_revenue", "doc_train_test_split",
        "minhash_lsh_candidates", "simhash_fingerprint", "emb_cosine_topk",
        "emb_near_dup_pairs", "emb_ivf_assign",
    ]
    names = sorted(timings)
    final = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cold": True,
        "host_alloc": host_alloc_ms_per_mb,
        "host_alloc_after": host_alloc_after,
        "host_suspect": host_suspect(host_alloc_ms_per_mb, host_alloc_after),
        "n_queries": len(names),
        "graph_build_sec": graph_build_sec,
        "standing_index_build_sec": standing_index_build_sec,
        "baseline_total_sec": baseline_total,
        "n_regressions_vs_baseline": len(regressions),
        "n_hash_mode": sum(1 for v in modes.values() if v == "hash"),
        "bench_file": "BENCH_local.json",
        "queries": {k: round(timings[k], 2) for k in headline if k in timings},
        "t_cs_key": "sorted_query_names",
        "t_cs": [int(round(timings[k] * 100)) for k in names],
    }
    line = json.dumps(final, separators=(",", ":"))
    budget = int(os.environ.get("SPARK_GRAFT_FINAL_LINE_BUDGET", "1800"))
    if len(line) > budget:
        # degrade gracefully: drop the headline dict first, then t_cs
        final.pop("queries", None)
        line = json.dumps(final, separators=(",", ":"))
        if len(line) > budget:
            final.pop("t_cs", None)
            final.pop("t_cs_key", None)
            line = json.dumps(final, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
