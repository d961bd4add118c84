"""Scale stress for the k-core analytic (queries/graph.py::g_kcore): a
deterministic preferential-attachment-ish graph orders of magnitude bigger
than the mini-repo fixture, h-index supersteps run TO CONVERGENCE (not the
fixed unroll the oracle replays), wall time + round count reported, and
the result verified against a driver-side textbook peel.

This is the evidence behind the query's scale claim: each superstep is one
join + one window + one agg on the same node key, state is one int per
node, and convergence is detected with a changed-count that goes to zero —
the loop terminates by monotone convergence of the h-index iteration
(Lu et al. 2016), no round cap needed.

Usage: python tools/stress_kcore.py [n_nodes] [edges_per_node]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from codegraphdb_spark.session import get_spark  # noqa: E402


def synth_edges(n_nodes: int, m: int) -> list[tuple[int, int]]:
    """Each node i links to m deterministic md5-derived earlier targets —
    hash-skewed toward small ids, giving the hub-heavy degree profile that
    stresses the per-key window."""
    edges = set()
    for i in range(1, n_nodes):
        for k in range(m):
            h = int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:8], 16)
            # square-bias toward earlier nodes = preferential attachment
            j = (h * h) % i if i > 1 else 0
            if j != i:
                edges.add((min(i, j), max(i, j)))
    return sorted(edges)


def kcore_distributed(spark, pairs):
    from codegraphdb_spark.operators.analytics import kcore_superstep

    und = spark.createDataFrame(pairs, "a BIGINT, b BIGINT")
    sym = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    vals = (
        sym.groupBy("a").agg(F.count(F.lit(1)).alias("val"))
        .withColumnRenamed("a", "node")
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while True:
        rounds += 1
        # THE shared superstep kernel from the shipped query
        nxt = kcore_superstep(sym, vals).localCheckpoint(eager=True)
        changed = (
            nxt.alias("n")
            .join(vals.alias("o"), "node")
            .filter(F.col("n.val") != F.col("o.val"))
            .count()
        )
        vals = nxt
        if changed == 0:
            return vals, rounds


def peel_local(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {v: len(ns) for v, ns in adj.items()}
    live = {v: set(ns) for v, ns in adj.items()}
    k = 0
    while live:
        k += 1
        while True:
            drop = [v for v, ns in live.items() if len(ns) < k]
            if not drop:
                break
            for v in drop:
                core[v] = k - 1
                for u in live[v]:
                    live[u].discard(v)
                del live[v]
    return core


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    pairs = synth_edges(n_nodes, m)
    print(f"graph: {n_nodes} nodes, {len(pairs)} undirected edges")
    spark = get_spark("stress-kcore")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    vals, rounds = kcore_distributed(spark, pairs)
    got = {r["node"]: r["val"] for r in vals.collect()}
    wall = time.time() - t0
    print(f"distributed h-index: {rounds} rounds to convergence, {wall:.1f}s")

    t1 = time.time()
    expected = peel_local(pairs)
    print(f"driver peel: {time.time() - t1:.1f}s")

    assert got == expected, (
        f"MISMATCH: {sum(1 for k in got if got[k] != expected.get(k))} nodes differ"
    )
    kmax = max(got.values())
    print(f"OK — coreness matches textbook peel exactly; max core = {kmax}")


if __name__ == "__main__":
    main()
