"""C1–C10 query helper tests + code hydration (D1–D3) golden checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.functions.code_ptr import FOLD_MARKER, decode_code_pointer
from codegraphdb_spark.queries.graph_queries import GraphQueries
from codegraphdb_spark.sources.repo import files_from_pairs
from tests.fixtures import mini_repo


@pytest.fixture(scope="module")
def gq(spark):
    eng = GraphEngine(spark)
    files = files_from_pairs(spark, mini_repo.V1)
    nodes, edges, _ = eng.build(files, "v1")
    return GraphQueries(nodes.cache(), edges.cache()), files, eng


def test_c1_point_lookup(gq):
    q, _, _ = gq
    row = q.match_node("pkga.base.Animal").first()
    assert row["kind"] == "CLASS" and row["file_path"] == "pkga/base.py"


def test_c2_label_property_filter(gq):
    q, _, _ = gq
    rows = q.find_nodes(kind="CLASS", name="Dog", version="v1").collect()
    assert [r["full_name"] for r in rows] == ["pkgb.dog.Dog"]


def test_c3_c4_children_of_module(gq):
    q, _, _ = gq
    all_children = {
        r["child_full_name"] for r in q.children_of_module("pkga.base").collect()
    }
    assert all_children == {"pkga.base.Animal", "pkga.base.GREETING"}
    named = q.children_of_module("pkga.base", child_name="Animal").collect()
    assert len(named) == 1 and named[0]["child_kind"] == "CLASS"


def test_c5_methods_of_class_includes_inherited(gq):
    q, _, _ = gq
    methods = {r["method_full_name"] for r in q.methods_of_class("pkgb.dog.Dog").collect()}
    assert "pkgb.dog.Dog.fetch" in methods
    assert "pkga.base.Animal.describe" in methods  # inherited via E1
    assert "pkga.base.Animal.__init__" not in methods


def test_c6_rel_point_match(gq):
    q, _, _ = gq
    assert q.rel_between("pkgb.dog.Dog", "pkga.base.Animal", "INHERITS").count() == 1
    assert q.rel_between("pkgb.dog.Dog", "pkga.base.Animal", "CALL").count() == 0


def test_c8_sql_surface(gq, spark):
    q, _, eng = gq
    eng.register_views(q.nodes, q.edges)
    out = spark.sql(
        """
        SELECT n.full_name FROM nodes n
        JOIN edges e ON e.src = n.full_name AND e.rel_type = 'INHERITS'
        WHERE n.kind = 'CLASS' ORDER BY n.full_name
        """
    ).collect()
    assert [r["full_name"] for r in out] == ["pkgb.dog.Dog", "pkgb.puppy.Puppy"]


def test_c9_version_scan(gq):
    q, _, _ = gq
    assert q.nodes_of_version("v1").count() == q.nodes.count()
    assert q.nodes_of_version("nope").count() == 0


def test_c10_code_hydration_and_pointer_roundtrip(gq, spark):
    q, files, _ = gq
    df = q.match_node("pkgb.dog.Dog.fetch")
    rendered = q.render_with_code(df, files)
    row = rendered.first()
    assert row["code"] == 'def fetch(self):\n    self.speak()\n    return MAX_DEPTH'
    # pointer wire-format roundtrip (D3)
    decoded = rendered.select(
        decode_code_pointer(F.col("code_ptr")).alias("p")
    ).first()["p"]
    assert (decoded["S"], decoded["E"], decoded["F"]) == (8, 10, "pkgb/dog.py")


def test_d2_code_folding(gq):
    q, files, _ = gq
    df = q.match_node("pkga.base.Animal")
    row = q.render_with_code(df, files, fold_over=10).first()
    assert row["code"].endswith(FOLD_MARKER) and len(row["code"]) == 10 + len(FOLD_MARKER)
