"""Re-baseline the per-query bench numbers (VERDICT r6 item 2).

BASELINE.md's original table covered only the first ~74 queries, so the
"within 2× of BASELINE" gate could not bind the expensive half of the
catalog, and single cold runs can't separate regression from JIT/cold
variance. This tool runs the FULL bench protocol N times (default 3),
each in a fresh subprocess — cold SparkSession per run, flagship +
worker-pool warm-up, wall time around a full collect() per query,
exactly what the driver records as BENCH_r{N}.json — and writes the
per-query MEDIANS to BASELINE_QUERIES.json at the repo root.

bench.py then compares every run against these medians and records any
query >1.5× its median in "regressions_vs_baseline", so each round's
BENCH record carries its own regression table.

Usage:
    python tools/rebaseline.py [runs]       # default 3, sf0.1
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    runs = int(pos[0]) if pos else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    per_run: list[dict[str, float]] = []
    host_allocs: list[float] = []
    host_allocs_after: list[float] = []
    suspects: list[bool] = []
    graph_builds: list[float] = []
    standing_builds: list[float] = []
    if "--from-records" in sys.argv:
        # pin from already-committed BENCH_rebaseline_run*.json records
        # instead of re-running the sweeps (each is ~6 min of wall)
        import glob

        for p in sorted(glob.glob(os.path.join(HERE, "BENCH_rebaseline_run*.json"))):
            with open(p) as fh:
                rec = json.load(fh)
            per_run.append(rec["queries"])
            host_allocs.append(rec.get("host_fresh_alloc_ms_per_mb"))
            host_allocs_after.append(rec.get("host_fresh_alloc_ms_per_mb_after"))
            suspects.append(bool(rec.get("host_suspect")))
            graph_builds.append(rec.get("graph_build_sec", 0.0))
            standing_builds.append(rec.get("standing_index_build_sec", 0.0))
            print(f"{os.path.basename(p)}: total {rec['value']}s")
        runs = len(per_run)
        if runs == 0:
            print("no BENCH_rebaseline_run*.json records found")
            sys.exit(1)
        _finish(
            per_run, host_allocs, host_allocs_after, suspects,
            graph_builds, standing_builds, runs, sf_dir,
        )
        return
    for i in range(runs):
        t0 = time.time()
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        # the regression report needs a baseline to exist; suppress it
        # while MEASURING the baseline so run 1 of a fresh re-baseline
        # doesn't compare against the file it is about to replace
        env["SPARK_GRAFT_NO_REGRESSION_REPORT"] = "1"
        subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            cwd=HERE,
            env=env,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(os.path.join(HERE, "BENCH_local.json")) as fh:
            rec = json.load(fh)
        # keep every run's full record (VERDICT r9 item 8: adjudicating
        # run-to-run gaps needs the per-run records, not just medians)
        with open(
            os.path.join(HERE, f"BENCH_rebaseline_run{i + 1}.json"), "w"
        ) as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
            fh.write("\n")
        per_run.append(rec["queries"])
        host_allocs.append(rec.get("host_fresh_alloc_ms_per_mb"))
        host_allocs_after.append(rec.get("host_fresh_alloc_ms_per_mb_after"))
        suspects.append(bool(rec.get("host_suspect")))
        graph_builds.append(rec.get("graph_build_sec", 0.0))
        standing_builds.append(rec.get("standing_index_build_sec", 0.0))
        print(
            f"run {i + 1}/{runs}: total {rec['value']}s "
            f"({round(time.time() - t0, 1)}s wall, probes "
            f"{rec.get('host_fresh_alloc_ms_per_mb')}/"
            f"{rec.get('host_fresh_alloc_ms_per_mb_after')} ms/MB"
            f"{', HOST-SUSPECT' if rec.get('host_suspect') else ''})",
            flush=True,
        )

    _finish(
        per_run, host_allocs, host_allocs_after, suspects,
        graph_builds, standing_builds, runs, sf_dir,
    )


def _finish(
    per_run, host_allocs, host_allocs_after, suspects,
    graph_builds, standing_builds, runs, sf_dir,
) -> None:
    # Medians pinned on a degraded host blunt the gate in the dangerous
    # direction (VERDICT r9 item 1: a real <=1.4x regression on a healthy
    # host reads under an inflated median and never flags). Probe-suspect
    # runs are still pinnable when the runs AGREE: the probe measures
    # fresh-page allocation cost, which any bench run inflates for its
    # successors via its own page-cache pressure (measured r10: idle
    # probe 0.08 ms/MB, post-sweep 6-25, yet three full sweeps totalled
    # 150.1/150.3/147.5s — 1.9% spread). Reproducibility is the property
    # medians need; an idle-host probe may never coincide with real
    # work. Refuse only when runs are BOTH probe-suspect and mutually
    # inconsistent (>10% total spread), the r9 driver-vs-builder shape.
    totals = [sum(r.values()) for r in per_run]
    spread = max(totals) / min(totals) if min(totals) > 0 else float("inf")
    consistent = runs >= 3 and spread <= 1.10
    if (
        any(suspects)
        and not consistent
        and not os.environ.get("SPARK_GRAFT_ALLOW_SUSPECT_PIN")
    ):
        print(
            f"REFUSING to pin: {sum(suspects)}/{runs} runs were "
            f"host-suspect AND totals spread {spread:.2f}x (>1.10x). "
            "Re-run on a quieter host, or set "
            "SPARK_GRAFT_ALLOW_SUSPECT_PIN=1 to pin anyway (the record "
            "will carry the probes)."
        )
        sys.exit(1)
    names = sorted(set().union(*[set(r) for r in per_run]))
    medians = {
        n: round(statistics.median([r[n] for r in per_run if n in r]), 3)
        for n in names
    }
    out = {
        "protocol": (
            "median of cold per-query wall seconds over "
            f"{runs} fresh-session bench.py runs (BASELINE.md §2)"
        ),
        "sf_dir": sf_dir,
        "runs": runs,
        "graph_build_sec_median": round(statistics.median(graph_builds), 3),
        "standing_index_build_sec_median": round(
            statistics.median(standing_builds), 3
        ),
        # host-state context (bench.py bracket probes): fresh-page
        # allocation cost before/after each run — readers of these
        # medians need to know what machine state produced them (see
        # STATUS.md host incident)
        "host_fresh_alloc_ms_per_mb_per_run": host_allocs,
        "host_fresh_alloc_ms_per_mb_after_per_run": host_allocs_after,
        "host_suspect_runs": sum(suspects),
        "run_totals_sec": [round(t, 3) for t in totals],
        "total_spread": round(spread, 3),
        "queries": medians,
    }
    path = os.path.join(HERE, "BASELINE_QUERIES.json")
    # keep the medians being replaced as a NAMED fallback column with
    # their own probe context (VERDICT r9 item 1c): a degraded-host
    # median set stays readable next to the healthy one it yields to
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        prev.pop("previous_medians", None)  # one level of history only
        out["previous_medians"] = {
            "host_fresh_alloc_ms_per_mb_per_run": prev.get(
                "host_fresh_alloc_ms_per_mb_per_run"
            ),
            "protocol": prev.get("protocol"),
            "queries": prev.get("queries"),
        }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    total = round(sum(medians.values()), 1)
    print(f"wrote {path}: {len(medians)} queries, median total {total}s")


if __name__ == "__main__":
    main()
