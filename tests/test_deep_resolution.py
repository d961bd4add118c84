"""A4 deep (type-propagated) resolution goldens on the instance-binding
fixture (mini_repo.DEEP_V1): ctor bindings for locals and self-fields,
annotation bindings, inherited methods reached through bindings, and the
documented dynamic-inference gaps (untyped parameters, non-ctor values)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.extract.ast_extract import _extract_one
from codegraphdb_spark.sources.repo import files_from_pairs
from tests.fixtures import mini_repo


@pytest.fixture(scope="module")
def deep_graph(spark):
    eng = GraphEngine(spark)
    nodes, edges, _ = eng.build(
        files_from_pairs(spark, mini_repo.DEEP_V1), "v1"
    )
    return nodes.cache(), edges.cache()


def test_assign_facts_emitted():
    facts = _extract_one("zoo/app.py", dict(mini_repo.DEEP_V1)["zoo/app.py"])
    assigns = {
        (f["full_name"], f["dst"]) for f in facts if f["fact"] == "assign"
    }
    assert assigns == {
        ("zoo.app.run::pet", "Animal"),
        ("zoo.app.adopt::pup", "Puppy"),
        ("zoo.app.Keeper.coach", "Trainer"),
        ("zoo.app.Keeper.buddy", "Animal"),
    }


def test_ref_bind_keys():
    facts = _extract_one("zoo/app.py", dict(mini_repo.DEEP_V1)["zoo/app.py"])
    keys = {
        (f["dst"], f["class"])
        for f in facts
        if f["fact"] == "ref" and f["kind"] == "CALL"
    }
    assert ("pet.speak", "zoo.app.run::pet") in keys
    # self.coach.train rewritten against the class; key = field full name
    assert (
        "zoo.app.Keeper.coach.train",
        "zoo.app.Keeper.coach",
    ) in keys


def test_deep_call_edges(deep_graph):
    _, edges = deep_graph
    calls = {
        (r.src, r.dst)
        for r in edges.filter(F.col("rel_type") == "CALL").collect()
    }
    assert calls == {
        # local ctor binding
        ("zoo.app.run", "zoo.animals.Animal.speak"),
        # inherited method through a local binding (method-map hit)
        ("zoo.app.adopt", "zoo.animals.Animal.describe"),
        # direct method on the bound subclass
        ("zoo.app.adopt", "zoo.app.Puppy.lick"),
        # field ctor binding
        ("zoo.app.Keeper.tend", "zoo.animals.Trainer.train"),
        # annotation binding
        ("zoo.app.Keeper.tend", "zoo.animals.Animal.speak"),
        # untyped parameter — the documented gap vs jedi
        ("zoo.animals.Trainer.train", "unsolved symbol"),
    }


def test_deep_uses_fields(deep_graph):
    _, edges = deep_graph
    uses = {
        (r.src, r.dst)
        for r in edges.filter(F.col("rel_type") == "USES").collect()
    }
    # self.name inside Animal methods and the Keeper fields resolve as FIELD uses
    assert ("zoo.animals.Animal.describe", "zoo.animals.Animal.name") in uses
    assert ("zoo.app.Keeper.tend", "zoo.app.Keeper.buddy") in uses


def test_last_assignment_wins(spark):
    src = (
        "from zoo.animals import Animal, Trainer\n"
        "def f():\n"
        "    x = Trainer()\n"
        "    x = Animal('a')\n"
        "    return x.speak()\n"
    )
    files = mini_repo.DEEP_V1[:2] + [("zoo/client.py", src)]
    eng = GraphEngine(spark)
    _, edges, _ = eng.build(files_from_pairs(spark, files), "v1")
    calls = {
        (r.src, r.dst)
        for r in edges.filter(
            (F.col("rel_type") == "CALL") & (F.col("src") == "zoo.client.f")
        ).collect()
    }
    assert calls == {("zoo.client.f", "zoo.animals.Animal.speak")}
