"""Graph read-side query helpers (reference C1–C10, graphDB.py /
ast_manage.py query shapes) over (nodes, edges) DataFrames.

Every helper is a declarative plan — Catalyst broadcasts the bound side of
the 1-hop expansions (the module/class filter yields a handful of rows)
and pushes kind/name predicates to the snapshot scan (which is partitioned
by kind — see GraphEngine.write_snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codegraphdb_spark.functions.code_ptr import encode_code_pointer, hydrate_code


class GraphQueries:
    def __init__(self, nodes: DataFrame, edges: DataFrame) -> None:
        self.nodes = nodes
        self.edges = edges

    def _vfilter(self, df: DataFrame, version: str | None) -> DataFrame:
        if version is None:
            return df
        return df.filter(F.array_contains("versions", version))

    # C1 — point lookup by key (graphDB.py:65-70)
    def match_node(self, full_name: str, version: str | None = None) -> DataFrame:
        return self._vfilter(self.nodes, version).filter(
            F.col("full_name") == full_name
        )

    # C2 — filter by label + property (graphDB.py:269-272)
    def find_nodes(
        self,
        kind: str | None = None,
        name: str | None = None,
        version: str | None = None,
    ) -> DataFrame:
        df = self._vfilter(self.nodes, version)
        if kind is not None:
            df = df.filter(F.col("kind") == kind)
        if name is not None:
            df = df.filter(F.col("name") == name)
        return df

    # C3/C4 — 1-hop expansion over CONTAINS (ast_manage.py:24-50)
    def children_of_module(
        self,
        module: str,
        child_name: str | None = None,
        version: str | None = None,
    ) -> DataFrame:
        e = self._vfilter(self.edges, version).filter(
            (F.col("rel_type") == "CONTAINS") & (F.col("src") == module)
        )
        child = self.nodes.select(
            F.col("full_name").alias("dst"),
            F.col("kind").alias("child_kind"),
            F.col("name").alias("child_name"),
        )
        out = e.join(child, "dst").select(
            F.col("dst").alias("child_full_name"),
            "child_kind",
            "child_name",
            "association_type",
        )
        if child_name is not None:
            out = out.filter(F.col("child_name") == child_name)
        return out

    # C5 — methods of class (ast_manage.py:52-62); includes closure-derived
    # edges, so inherited methods appear exactly as in the reference
    def methods_of_class(self, cls: str, version: str | None = None) -> DataFrame:
        return (
            self._vfilter(self.edges, version)
            .filter((F.col("rel_type") == "HAS_METHOD") & (F.col("src") == cls))
            .select(F.col("dst").alias("method_full_name"))
        )

    # C6 — relationship point match (graphDB.py:144)
    def rel_between(self, src: str, dst: str, rel_type: str) -> DataFrame:
        return self.edges.filter(
            (F.col("src") == src)
            & (F.col("dst") == dst)
            & (F.col("rel_type") == rel_type)
        )

    # C9 — full scan of a version (update_version.py:29-30)
    def nodes_of_version(self, version: str) -> DataFrame:
        return self.nodes.filter(F.array_contains("versions", version))

    # C10 — result render with lazy code expansion (graphDB.py:228-257):
    # emit the reference's <CODE> wire format AND the hydrated/folded text
    def render_with_code(
        self, df: DataFrame, files: DataFrame, fold_over: int | None = None
    ) -> DataFrame:
        with_ptr = df.withColumn(
            "code_ptr",
            F.when(
                F.col("code_file").isNotNull(),
                encode_code_pointer(
                    F.col("code_file"), F.col("code_start"), F.col("code_end")
                ),
            ),
        )
        return hydrate_code(with_ptr, files, out_col="code", fold_over=fold_over)
