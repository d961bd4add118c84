"""Graph analytics over the (nodes, edges) snapshot — the "GraphX for
analytics" role from BASELINE.json, expressed as join-based iteration
(GraphFrames isn't available in this environment; the aggregateMessages
pattern is exactly a join + groupBy-sum per superstep, which is what GraphX
compiles to anyway).

PageRank runs in SCALED-INTEGER arithmetic (rank × 10^12 as int64, floor
division) so every iteration is exactly reproducible across engines,
partitionings and retries — float PageRank accumulates in shuffle order
and never hash-matches. Semantics (documented, deterministic):

    pr_0(v)   = SCALE // N
    contrib(e)= pr(src) // outdeg(src)
    pr'(v)    = BASE + DAMP_NUM * (Σ contrib into v) // DAMP_DEN
    BASE      = (SCALE // N) * (DAMP_DEN - DAMP_NUM) // DAMP_DEN

Dangling-node mass is dropped (the simple variant); ranks are comparable,
not normalized probabilities. At scale: per superstep one join (edges ⋈
ranks, broadcast ranks if vertices ≪ edges) + one groupBy-sum; lineage cut
by localCheckpoint every few supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE = 10**12
DAMP_NUM = 85
DAMP_DEN = 100


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-vertex in/out degree by edge type — the basic centrality scan."""
    out_d = edges.groupBy(F.col("src").alias("vertex"), "rel_type").agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("vertex"), "rel_type").agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, ["vertex", "rel_type"], "full_outer")
        .select(
            "vertex",
            "rel_type",
            F.coalesce("out_degree", F.lit(0)).cast("bigint").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("bigint").alias("in_degree"),
        )
    )


# Hybrid threshold for the iterative analytics (pagerank / k-core), in
# distinct EDGES: under it, the exact pure-Python replica runs driver-side
# (one limit-probed collect + one LocalTableScan back) instead of paying
# iterations × (join+agg) of scheduling; above it, the distributed
# supersteps run unchanged. Identical integer semantics by construction —
# the replicas ARE the golden references the distributed kernels are
# tested against (force_distributed keeps those tests meaningful).
DRIVER_GRAPH_LIMIT = 200_000


def pagerank_int(
    edges: DataFrame, iterations: int = 10, force_distributed: bool = False
) -> DataFrame:
    """(vertex, rank_scaled BIGINT) after ``iterations`` supersteps of the
    integer-arithmetic PageRank defined in the module docstring."""
    pairs = edges.select("src", "dst").dropDuplicates()
    if not force_distributed:
        sample = pairs.limit(DRIVER_GRAPH_LIMIT + 1).collect()
        if len(sample) <= DRIVER_GRAPH_LIMIT:
            spark = edges.sparkSession
            from pyspark.sql.types import LongType, StructField, StructType

            schema = StructType(
                [
                    StructField("vertex", pairs.schema["src"].dataType),
                    StructField("rank_scaled", LongType()),
                ]
            )
            if not sample:  # empty graph (reference would divide by N=0)
                return spark.createDataFrame([], schema)
            ranks = pagerank_int_reference(
                [(r.src, r.dst) for r in sample], iterations=iterations
            )
            import pandas as pd

            return spark.createDataFrame(
                pd.DataFrame(sorted(ranks.items()), columns=["vertex", "rank_scaled"]),
                schema=schema,
            )
    vertices = (
        pairs.select(F.col("src").alias("vertex"))
        .unionByName(pairs.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        # empty graph: an empty ranks frame, not a ZeroDivisionError
        return vertices.withColumn("rank", F.lit(0).cast("bigint"))
    init = SCALE // n
    base = (SCALE // n) * (DAMP_DEN - DAMP_NUM) // DAMP_DEN

    outdeg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    links = pairs.join(outdeg, "src").localCheckpoint(eager=True)

    ranks = vertices.withColumn("rank", F.lit(init).cast("bigint"))
    for i in range(iterations):
        contribs = (
            links.join(ranks, links.src == ranks.vertex)
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            vertices.join(contribs, vertices.vertex == contribs.dst, "left")
            .select(
                "vertex",
                (
                    F.lit(base)
                    + F.expr(f"{DAMP_NUM} * coalesce(inflow, 0L) div {DAMP_DEN}")
                ).cast("bigint").alias("rank"),
            )
        )
        if i % 3 == 2:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("vertex", F.col("rank").alias("rank_scaled"))


def pagerank_int_reference(edge_list: list[tuple[str, str]], iterations: int = 10) -> dict[str, int]:
    """Pure-Python replica of :func:`pagerank_int` (same integer semantics)
    for golden-testing the distributed implementation."""
    pairs = sorted(set(edge_list))
    vertices = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n = len(vertices)
    init = SCALE // n
    base = (SCALE // n) * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    outdeg: dict[str, int] = {}
    for s, _ in pairs:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = dict.fromkeys(vertices, init)
    for _ in range(iterations):
        inflow = dict.fromkeys(vertices, 0)
        for s, d in pairs:
            inflow[d] += ranks[s] // outdeg[s]
        ranks = {v: base + DAMP_NUM * inflow[v] // DAMP_DEN for v in vertices}
    return ranks


def kcore_superstep(sym: DataFrame, vals: DataFrame) -> DataFrame:
    """ONE h-index superstep of the k-core iteration (Lu et al. 2016):
    replace each node's value with the h-index of its neighbors' values.
    THE shared kernel — queries/graph.py::g_kcore (fixed unroll matching
    the DuckDB oracle) and tools/stress_kcore.py (run to convergence at
    scale) both call this, so the iteration can never drift between the
    shipped query and its scale evidence.

    ``sym``: symmetrized edge list (a, b); ``vals``: (node, val).
    One join + one window + one agg, all keyed on the same node column —
    one exchange per superstep at any scale."""
    nb = sym.join(vals, sym["b"] == vals["node"]).select("a", "val")
    rn = F.row_number().over(Window.partitionBy("a").orderBy(F.col("val").desc()))
    return (
        nb.select("a", F.least(rn, F.col("val")).alias("h"))
        .groupBy("a")
        .agg(F.max("h").alias("val"))
        .withColumnRenamed("a", "node")
    )


def kcore_hindex_reference(
    sym_pairs: list[tuple[str, str]], rounds: int
) -> dict[str, int]:
    """Pure-Python replica of the fixed-unroll h-index iteration: degree
    init (round 1) + ``rounds - 1`` kcore_superstep-equivalent rounds.
    Bit-identical to the distributed kernel by construction (same h-index
    definition: max over sorted-desc neighbor values of min(position,
    value))."""
    adj: dict[str, list[str]] = {}
    for a, b in sym_pairs:
        adj.setdefault(a, []).append(b)
    vals = {a: len(ns) for a, ns in adj.items()}
    for _ in range(rounds - 1):
        new = {}
        for a, ns in adj.items():
            h = 0
            for i, v in enumerate(
                sorted((vals[b] for b in ns), reverse=True), start=1
            ):
                if v < i:  # min(i, v) can only shrink from here on
                    break
                h = i
            new[a] = h
        vals = new
    return vals


def kcore_fixed_rounds(
    und: DataFrame, rounds: int, force_distributed: bool = False
) -> DataFrame:
    """(node, val) after ``rounds`` total h-index rounds over an
    undirected edge list ``und`` (a, b) — canonical orientation, deduped,
    no self-loops. Hybrid like pagerank_int: under DRIVER_GRAPH_LIMIT
    edges the exact replica runs driver-side; above it, one distributed
    kcore_superstep per round."""
    if not force_distributed:
        sample = und.limit(DRIVER_GRAPH_LIMIT + 1).collect()
        if len(sample) <= DRIVER_GRAPH_LIMIT:
            spark = und.sparkSession
            from pyspark.sql.types import IntegerType, StructField, StructType

            schema = StructType(
                [
                    StructField("node", und.schema["a"].dataType),
                    StructField("val", IntegerType()),
                ]
            )
            pairs = [(r.a, r.b) for r in sample]
            pairs += [(b, a) for a, b in pairs]
            vals = kcore_hindex_reference(pairs, rounds)
            if not vals:
                return spark.createDataFrame([], schema)
            import pandas as pd

            return spark.createDataFrame(
                pd.DataFrame(sorted(vals.items()), columns=["node", "val"]),
                schema=schema,
            )
    sym = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    vals = (
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).alias("val"))
        .withColumnRenamed("a", "node")
    )
    for _ in range(rounds - 1):
        vals = kcore_superstep(sym, vals)
    return vals
