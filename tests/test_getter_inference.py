"""Round-4 getter-inference edge cases (review findings): decorated
methods must not be read as instance getters, and a LATER alias rebind of
a field must kill the inference (last-assignment-wins), not resurrect an
earlier instance binding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.extract.ast_extract import _extract_one
from codegraphdb_spark.sources.repo import files_from_pairs

STATIC_SRC = """\
class Shelter:
    def setup(self):
        self.vet = Trainer()

    @staticmethod
    def unwrap(box):
        return box.vet

    @classmethod
    def peek(cls):
        return cls.vet
"""


def test_decorated_methods_emit_no_self_return_facts():
    facts = _extract_one("pkg/mod.py", STATIC_SRC)
    returns = {f["full_name"] for f in facts if f["fact"] == "returns"}
    assert "pkg.mod.Shelter.unwrap" not in returns  # box is NOT self
    assert "pkg.mod.Shelter.peek" not in returns  # cls is NOT an instance


REBIND_FILES = [
    (
        "zoo2/animals.py",
        "class Trainer:\n"
        "    def train(self):\n"
        "        return 1\n",
    ),
    (
        "zoo2/app.py",
        "from zoo2.animals import Trainer\n\n"
        "class Shelter:\n"
        "    def setup(self):\n"
        "        self.vet = Trainer()\n\n"
        "    def reset(self):\n"
        "        self.vet = Trainer\n\n"  # LATER alias rebind (class object)
        "    def resident(self):\n"
        "        return self.vet\n\n\n"
        "def consult():\n"
        "    s = Shelter()\n"
        "    v = s.resident()\n"
        "    return v.train()\n",
    ),
]


@pytest.fixture(scope="module")
def rebind_graph(spark):
    eng = GraphEngine(spark, small_repo=True)
    nodes, edges, _ = eng.build(files_from_pairs(spark, REBIND_FILES), "v1")
    return nodes.cache(), edges.cache()


def test_alias_rebound_field_kills_getter_inference(rebind_graph):
    """self.vet's LAST assignment binds the class OBJECT (alias), so
    resident() must NOT be inferred to return a Trainer instance — the
    v.train() call stays unsolved rather than fabricating a CALL edge
    (false edges are worse than missed ones)."""
    _, edges = rebind_graph
    calls = {
        (r.src, r.dst)
        for r in edges.filter(F.col("rel_type") == "CALL").collect()
    }
    assert ("zoo2.app.consult", "zoo2.animals.Trainer.train") not in calls
    # the call to the getter itself still resolves
    assert ("zoo2.app.consult", "zoo2.app.Shelter.resident") in calls
