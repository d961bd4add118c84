"""E4 override detection golden test on the mini-repo."""

from __future__ import annotations

import pytest

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.operators.closure import override_edges, transitive_bases
from codegraphdb_spark.sources.repo import files_from_pairs
from tests.fixtures import mini_repo


@pytest.fixture(scope="module")
def graph(spark):
    eng = GraphEngine(spark)
    nodes, edges, _ = eng.build(files_from_pairs(spark, mini_repo.V1), "v1")
    return nodes.cache(), edges.cache()


def test_transitive_bases(graph):
    _, edges = graph
    bases = {tuple(r) for r in transitive_bases(edges).collect()}
    assert bases == {
        ("pkgb.dog.Dog", "pkga.base.Animal"),
        ("pkgb.puppy.Puppy", "pkgb.dog.Dog"),
        ("pkgb.puppy.Puppy", "pkga.base.Animal"),  # transitive hop
    }


def test_override_edges(graph):
    nodes, edges = graph
    ov = {(r["src"], r["dst"]) for r in override_edges(nodes, edges).collect()}
    # Dog.speak overrides Animal.speak; nothing else shares a name upward
    assert ov == {("pkgb.dog.Dog.speak", "pkga.base.Animal.speak")}
