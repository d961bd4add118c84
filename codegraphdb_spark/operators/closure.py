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

# path doubling: 2^40 exceeds any real inheritance depth
MAX_ITERATIONS = 40


# fixpoint probes are driver actions; the first BLIND_ROUNDS doubling
# rounds run unprobed in one lazy plan (covers depth <= 2^BLIND_ROUNDS,
# which is every real inheritance hierarchy) — deeper graphs fall through
# to the probed loop
BLIND_ROUNDS = 2


def _double(acc: DataFrame) -> DataFrame:
    return (
        acc.alias("a")
        .join(acc.alias("b"), F.col("a.ancestor") == F.col("b.cls"))
        .select(F.col("a.cls").alias("cls"), F.col("b.ancestor").alias("ancestor"))
    )


def transitive_bases(edges: DataFrame) -> DataFrame:
    """(cls, ancestor) pairs over the INHERITS DAG to fixpoint, by path
    doubling. Typical cost: ONE materialization + ONE emptiness probe
    (blind rounds fold into a single plan); only pathological depth pays
    per-round actions."""
    inherits = (
        edges.filter(F.col("rel_type") == "INHERITS")
        .select(F.col("src").alias("cls"), F.col("dst").alias("ancestor"))
        .dropDuplicates()
    )
    acc = inherits
    for _ in range(BLIND_ROUNDS):
        acc = acc.unionByName(_double(acc)).dropDuplicates()
    acc = acc.localCheckpoint(eager=True)
    for _ in range(MAX_ITERATIONS):
        hop = _double(acc).dropDuplicates().exceptAll(acc)
        if hop.isEmpty():
            break
        acc = acc.unionByName(hop).dropDuplicates().localCheckpoint(eager=True)
    return acc


def override_edges(nodes: DataFrame, edges: DataFrame) -> DataFrame:
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


def inherited_method_closure(edges: DataFrame) -> DataFrame:
    """Returns the NEW HAS_METHOD edges implied by inheritance (not the
    direct ones), each carrying the versions array of the class's INHERITS
    edge."""
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
