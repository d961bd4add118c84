"""Iterative graph closures (reference §2.E).

E1 — transitive inherited-method closure (_build_inherited_method,
ast_manage.py:79-99): every class receives HAS_METHOD edges to all methods
of its transitive bases, EXCEPT ``__init__`` (ast_manage.py:92-93). The
reference does a memoized DFS with per-pair Cypher writes; here:

  1. ``transitive_bases``: (cls, ancestor) closure over INHERITS by PATH
     DOUBLING — A_{k+1} = A_k ∪ (A_k ∘ A_k) — so a depth-d hierarchy
     converges in O(log d) rounds instead of O(d). Each round is one
     self-join + exceptAll; ``localCheckpoint`` truncates lineage
     (SURVEY §7.3 hard part a). Cycles are tolerated: the closure is
     monotone and bounded by |classes|².
  2. one join: ancestors × their direct non-__init__ methods.

At scale the INHERITS/bases tables are tiny relative to the corpus —
broadcast-sized — and the expensive side (methods) is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# path doubling: 2^40 exceeds any real inheritance depth
MAX_ITERATIONS = 40


# fixpoint probes are driver actions; the first BLIND_ROUNDS doubling
# rounds run unprobed in one lazy plan (covers depth <= 2^BLIND_ROUNDS,
# which is every real inheritance hierarchy) — deeper graphs fall through
# to the probed loop
BLIND_ROUNDS = 2


def _compose(acc: DataFrame) -> DataFrame:
    """Min-plus composition step: paths a→b and b→c give a→c at summed
    distance (the doubling round for shortest-hop-count closure)."""
    return (
        acc.alias("a")
        .join(acc.alias("b"), F.col("a.ancestor") == F.col("b.cls"))
        .select(
            F.col("a.cls").alias("cls"),
            F.col("b.ancestor").alias("ancestor"),
            (F.col("a.dist") + F.col("b.dist")).alias("dist"),
        )
    )


def _min_union(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("cls", "ancestor")
        .agg(F.min("dist").alias("dist"))
    )


# below this many INHERITS pairs the closure is computed on the driver
# (collect → dict BFS → parallelize): the class hierarchy of even a huge
# monorepo is a few 100k edges — far smaller than the corpus — and the
# driver round-trip replaces per-round join/probe/checkpoint actions
DRIVER_CLOSURE_LIMIT = 200_000


def _driver_closure(pairs: list[tuple[str, str]]) -> list[tuple[str, str, int]]:
    """Exact transitive closure over (cls, ancestor) pairs, driver-side,
    with MINIMAL HOP DISTANCE per pair (BFS visits in nondecreasing
    depth). Cycles are tolerated via the visited map."""
    from collections import deque

    parents: dict[str, set[str]] = {}
    for cls, anc in pairs:
        parents.setdefault(cls, set()).add(anc)
    out: list[tuple[str, str, int]] = []
    for cls in parents:
        depth: dict[str, int] = {}
        q = deque((p, 1) for p in sorted(parents[cls]))
        while q:
            anc, d = q.popleft()
            if anc in depth:
                continue
            depth[anc] = d
            q.extend((p, d + 1) for p in parents.get(anc, ()))
        out.extend((cls, anc, d) for anc, d in depth.items())
    return out


def transitive_bases(edges: DataFrame, force_distributed: bool = False) -> DataFrame:
    """(cls, ancestor, dist) triples over the INHERITS DAG to fixpoint,
    ``dist`` = minimal hop count (1 = direct base) — consumed by
    inherited_method_map's nearest-ancestor-wins ordering (the MRO
    approximation, ADVICE r2).

    Hybrid strategy: the INHERITS table is the one graph-shaped input that
    is ALWAYS small relative to the corpus (classes × direct bases), so
    sub-threshold graphs take a driver-side exact closure — one collect,
    zero fixpoint actions. Larger graphs fall back to distributed MIN-PLUS
    PATH DOUBLING — A_{k+1} = min(A_k ∪ (A_k ∘ A_k)) — converging in
    O(log depth) rounds with lineage checkpoints (SURVEY §7.3 hard
    part a).

    ``force_distributed=True`` skips the driver fast path regardless of
    size — used by the crossover benchmark (tools/stress_graph.py) and the
    path-equality test that keep DRIVER_CLOSURE_LIMIT honest."""
    inherits = (
        edges.filter(F.col("rel_type") == "INHERITS")
        .select(F.col("src").alias("cls"), F.col("dst").alias("ancestor"))
        .dropDuplicates()
    )
    spark = inherits.sparkSession
    # ONE action decides the strategy AND fetches the small case's data:
    # limit(L+1) returning ≤ L rows proves the set is complete
    sample = (
        []
        if force_distributed
        else inherits.limit(DRIVER_CLOSURE_LIMIT + 1).collect()
    )
    if not force_distributed and len(sample) <= DRIVER_CLOSURE_LIMIT:
        closed = _driver_closure([(r.cls, r.ancestor) for r in sample])
        schema = "cls string, ancestor string, dist int"
        if not closed:
            return spark.createDataFrame([], schema)
        # pandas input → JVM LocalTableScan; a plain-list createDataFrame
        # would plan as a pickled-Python-RDD scan replayed on every
        # downstream action over the closure
        import pandas as pd

        closed_pdf = pd.DataFrame(closed, columns=["cls", "ancestor", "dist"])
        return spark.createDataFrame(closed_pdf, schema).coalesce(
            max(1, min(len(closed) // 10_000, 32))
        )
    acc = inherits.withColumn("dist", F.lit(1).cast("int")).localCheckpoint(
        eager=True
    )
    for _ in range(BLIND_ROUNDS):
        acc = _min_union(acc, _compose(acc))
    acc = acc.localCheckpoint(eager=True)
    for _ in range(MAX_ITERATIONS):
        new = _min_union(acc, _compose(acc)).localCheckpoint(eager=True)
        # fixpoint when no pair was added AND no distance improved
        if new.exceptAll(acc).isEmpty():
            break
        acc = new
    return acc


def inherited_method_map(bases: DataFrame, edges: DataFrame) -> DataFrame:
    """(derived_name, method_name) lookup for the A4 deep pass: class C
    with transitive ancestor A owning non-__init__ method A.m yields
    ``C.m → A.m`` — so a call through an instance of C to a method C only
    inherits resolves to the defining base. When several ancestors define
    the same short name (diamond), the NEAREST ancestor wins (min hop
    distance from the closure — the MRO approximation, ADVICE r2), with a
    lexicographic tie-break at equal depth — deterministic, and overridden
    anyway whenever C defines m itself (the symbol table outranks this map
    in the overlay)."""
    direct = (
        edges.filter(F.col("rel_type") == "HAS_METHOD")
        .select(F.col("src").alias("m_owner"), F.col("dst").alias("method"))
        .withColumn("short", F.element_at(F.split("method", r"\."), -1))
        .filter(F.col("short") != "__init__")
    )
    w = Window.partitionBy("derived_name").orderBy("dist", "method_name")
    return (
        bases.join(direct, bases.ancestor == direct.m_owner)
        .select(
            F.concat_ws(".", "cls", "short").alias("derived_name"),
            F.col("method").alias("method_name"),
            "dist",
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "dist")
    )


def override_edges(
    nodes: DataFrame, edges: DataFrame, bases: DataFrame | None = None
) -> DataFrame:
    """E4: override detection (reference records OVERRIDE only into the
    throwaway Sourcetrail store, indexer_visitor.py:125-157; here it is a
    first-class derived edge). A method M in class C OVERRIDES method M' in
    ancestor A when name(M) == name(M') and C →INHERITS*→ A.

    Pure joins: methods×methods equi-join on method NAME, constrained by
    the transitive-bases closure — never a cross join."""
    methods = nodes.filter(F.col("kind") == "METHOD").select(
        F.col("full_name").alias("m_name"),
        F.col("name").alias("short"),
        F.col("class").alias("m_cls"),
    )
    if bases is None:
        bases = transitive_bases(edges)
    sub = methods.alias("sub")
    sup = methods.alias("sup")
    return (
        sub.join(bases, F.col("sub.m_cls") == F.col("cls"))
        .join(
            sup,
            (F.col("sup.m_cls") == F.col("ancestor"))
            & (F.col("sub.short") == F.col("sup.short")),
        )
        .select(
            F.col("sub.m_name").alias("src"),
            F.col("sup.m_name").alias("dst"),
            F.lit("OVERRIDES").alias("rel_type"),
        )
        .dropDuplicates(["src", "dst"])
    )


def inherited_method_closure(
    edges: DataFrame, bases: DataFrame | None = None
) -> DataFrame:
    """Returns the NEW HAS_METHOD edges implied by inheritance (not the
    direct ones), each carrying the versions array of the class's INHERITS
    edge. Pass precomputed ``bases`` to reuse one transitive closure
    across the compile pipeline (deep resolve / E1 / E4)."""
    inherits_versions = (
        edges.filter(F.col("rel_type") == "INHERITS")
        .select(F.col("src").alias("owner"), "versions")
        .groupBy("owner")
        # deterministic UNION of all bases' version arrays — dropDuplicates
        # here would take a partition-order-dependent pick for multi-base
        # classes whose INHERITS edges carry different versions
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("versions")))
            ).alias("versions")
        )
    )
    direct = (
        edges.filter(F.col("rel_type") == "HAS_METHOD")
        .select(F.col("src").alias("m_owner"), F.col("dst").alias("method"))
    )
    # never propagate __init__ (ast_manage.py:92-93)
    non_init = direct.filter(
        F.element_at(F.split("method", r"\."), -1) != "__init__"
    )
    if bases is None:
        bases = transitive_bases(edges)
    inherited = (
        bases.join(non_init, bases.ancestor == non_init.m_owner)
        .select(F.col("cls").alias("owner"), "method")
        .dropDuplicates()
    )
    versioned = inherited.join(inherits_versions, "owner", "left")
    return versioned.select(
        F.col("owner").alias("src"),
        F.col("method").alias("dst"),
        F.lit("HAS_METHOD").alias("rel_type"),
        F.lit(None).cast("string").alias("association_type"),
        F.coalesce("versions", F.array().cast("array<string>")).alias("versions"),
    )
