"""Closure scaling regression: a deep inheritance chain must converge in
O(log depth) path-doubling rounds (a linear loop would take depth rounds —
minutes of driver actions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.sources.repo import files_from_pairs


def test_deep_chain_closure(spark):
    depth = 32
    src = "class C0:\n    def m0(self):\n        return 0\n"
    for i in range(1, depth + 1):
        src += f"class C{i}(C{i-1}):\n    def m{i}(self):\n        return {i}\n"
    eng = GraphEngine(spark)
    _, edges, _ = eng.build(files_from_pairs(spark, [("chain.py", src)]), "v1")
    top = edges.filter(
        (F.col("rel_type") == "HAS_METHOD") & (F.col("src") == f"chain.C{depth}")
    ).count()
    assert top == depth + 1  # own method + every ancestor's (no __init__ involved)
    mid = edges.filter(
        (F.col("rel_type") == "HAS_METHOD") & (F.col("src") == "chain.C1")
    ).count()
    assert mid == 2
