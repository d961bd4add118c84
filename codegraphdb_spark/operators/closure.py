"""Iterative graph closures (reference §2.E).

E1 — transitive inherited-method closure (_build_inherited_method,
ast_manage.py:79-99): every class receives HAS_METHOD edges to all methods
of its transitive bases, EXCEPT ``__init__`` (ast_manage.py:92-93). The
reference does a memoized DFS with per-pair Cypher writes; here it is a
join+union fixpoint loop:

    M_0   = direct HAS_METHOD
    M_k+1 = M_k ∪ (INHERITS ⋈ M_k on base)   until no growth

Convergence is bounded by the inheritance DAG depth (cycles are tolerated:
dropDuplicates makes the iteration monotone and the fixpoint finite).
``localCheckpoint`` truncates lineage each round (SURVEY §7.3 hard part a)
so plans don't grow exponentially. At scale the INHERITS table is tiny
relative to the corpus — broadcast it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 50


def inherited_method_closure(edges: DataFrame) -> DataFrame:
    """Returns the NEW HAS_METHOD edges implied by inheritance (not the
    direct ones), each carrying the versions array of the class's INHERITS
    edge."""
    inherits = (
        edges.filter(F.col("rel_type") == "INHERITS")
        .select(F.col("src").alias("cls"), F.col("dst").alias("base"), "versions")
    )
    direct = (
        edges.filter(F.col("rel_type") == "HAS_METHOD")
        .select(F.col("src").alias("owner"), F.col("dst").alias("method"))
    )
    # never propagate __init__ (ast_manage.py:92-93)
    non_init = direct.filter(
        F.element_at(F.split("method", r"\."), -1) != "__init__"
    )

    acc = non_init
    for _ in range(MAX_ITERATIONS):
        new = (
            F.broadcast(inherits)
            .join(acc, inherits.base == acc.owner)
            .select(F.col("cls").alias("owner"), "method")
            .exceptAll(acc.select("owner", "method"))
            .dropDuplicates()
        )
        if new.isEmpty():
            break
        acc = acc.unionByName(new).localCheckpoint(eager=True)

    inherited_only = acc.exceptAll(non_init)
    # carry versions from the class's INHERITS edge (derived edges exist in
    # the versions where the inheritance exists)
    versioned = inherited_only.join(
        inherits.select(F.col("cls").alias("owner"), "versions").dropDuplicates(["owner"]),
        "owner",
        "left",
    )
    return versioned.select(
        F.col("owner").alias("src"),
        F.col("method").alias("dst"),
        F.lit("HAS_METHOD").alias("rel_type"),
        F.lit(None).cast("string").alias("association_type"),
        F.coalesce("versions", F.array().cast("array<string>")).alias("versions"),
    )
