"""Graph analytics: distributed integer PageRank must equal the pure-Python
replica exactly; degree stats golden-checked."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.operators.analytics import (
    degree_stats,
    pagerank_int,
    pagerank_int_reference,
)
from codegraphdb_spark.sources.repo import files_from_pairs
from tests.fixtures import mini_repo


@pytest.fixture(scope="module")
def graph(spark):
    eng = GraphEngine(spark)
    nodes, edges, _ = eng.build(files_from_pairs(spark, mini_repo.V1), "v1")
    return nodes.cache(), edges.cache()


def test_pagerank_matches_python_replica(spark, graph):
    _, edges = graph
    edge_list = [(r["src"], r["dst"]) for r in edges.select("src", "dst").collect()]
    expected = pagerank_int_reference(edge_list, iterations=10)
    got = {
        r["vertex"]: r["rank_scaled"]
        for r in pagerank_int(edges, iterations=10, force_distributed=True).collect()
    }
    assert got == expected  # exact integer equality, every vertex


def test_pagerank_deterministic_across_partitionings(spark, graph):
    _, edges = graph
    r1 = {
        r["vertex"]: r["rank_scaled"]
        for r in pagerank_int(edges.repartition(16), iterations=5, force_distributed=True).collect()
    }
    r2 = {
        r["vertex"]: r["rank_scaled"]
        for r in pagerank_int(edges.coalesce(1), iterations=5, force_distributed=True).collect()
    }
    assert r1 == r2


def test_degree_stats(graph):
    _, edges = graph
    d = {
        (r["vertex"], r["rel_type"]): (r["out_degree"], r["in_degree"])
        for r in degree_stats(edges).collect()
    }
    # Puppy in v1: 5 HAS_METHOD out (whine + Dog.speak/fetch + Animal.speak/describe)
    assert d[("pkgb.puppy.Puppy", "HAS_METHOD")] == (5, 0)
    # Animal: 1 INHERITS in (Dog), 0 out
    assert d[("pkga.base.Animal", "INHERITS")] == (0, 1)
    # unsolved sentinel: CALL in-degree 1 (Puppy.whine)
    assert d[("unsolved symbol", "CALL")] == (0, 1)


def test_kcore_matches_direct_peeling(spark, sf_dir):
    """The fixed-superstep h-index iteration must equal the textbook
    sequential peel (core number = largest k whose k-core contains the
    node) — validating the convergence claim, not just cross-engine
    agreement."""
    from codegraphdb_spark import registry

    registry.load_all()
    got = {
        r["full_name"]: r["core"]
        for r in registry.QUERIES["g_kcore"](spark, sf_dir).collect()
    }
    # rebuild the same undirected edge set and peel in pure Python
    from codegraphdb_spark.queries.graph import _graph
    import pyspark.sql.functions as F

    _, edges, _ = _graph(spark)
    und = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in edges.filter(F.col("rel_type").isin("CONTAINS", "INHERITS"))
        .select("src", "dst")
        .collect()
        if r["src"] != r["dst"]
    }
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {v: len(ns) for v, ns in adj.items()}
    live = dict(adj)
    k = 0
    while live:
        k += 1
        changed = True
        while changed:
            drop = [v for v, ns in live.items() if len(ns) < k]
            changed = bool(drop)
            for v in drop:
                core[v] = k - 1
                for u in live[v]:
                    live[u].discard(v)
                del live[v]
    assert got == core


def test_pagerank_hybrid_driver_equals_distributed(spark, graph):
    """The driver fast path (pure-Python replica under DRIVER_GRAPH_LIMIT)
    must return exactly the distributed kernel's integer ranks."""
    _, edges = graph
    drv = {
        r["vertex"]: r["rank_scaled"]
        for r in pagerank_int(edges, iterations=10).collect()
    }
    dst = {
        r["vertex"]: r["rank_scaled"]
        for r in pagerank_int(edges, iterations=10, force_distributed=True).collect()
    }
    assert drv == dst and drv


def test_kcore_hybrid_driver_equals_distributed(spark):
    """kcore_fixed_rounds: driver replica vs distributed supersteps on a
    graph with a 3-core (K4), a chain tail, and a triangle."""
    from codegraphdb_spark.operators.analytics import kcore_fixed_rounds

    und_pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"),
        ("x", "y"), ("x", "z"), ("y", "z"),
    ]
    und = spark.createDataFrame(und_pairs, "a STRING, b STRING")
    drv = {r["node"]: r["val"] for r in kcore_fixed_rounds(und, 8).collect()}
    dst = {
        r["node"]: r["val"]
        for r in kcore_fixed_rounds(und, 8, force_distributed=True).collect()
    }
    assert drv == dst
    assert drv["a"] == 3 and drv["f"] == 1 and drv["x"] == 2
