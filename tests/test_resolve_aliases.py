"""Resolution-precedence tests: aliased imports, plain `import a.b`
chains, shadowing (local symbol beats star import), absolute references."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.sources.repo import files_from_pairs

FILES = [
    (
        "lib/core.py",
        "def compute(x):\n    return x\n\nTHRESHOLD = 10\n",
    ),
    (
        "lib/extra.py",
        "def helper():\n    return 1\n",
    ),
    (
        "app/named_alias.py",
        "from lib.core import compute as calc\n\n"
        "def run():\n    return calc(1)\n",
    ),
    (
        "app/module_alias.py",
        "import lib.core as lc\n\n"
        "def run():\n    return lc.compute(2)\n",
    ),
    (
        "app/plain_import.py",
        "import lib.core\n\n"
        "def run():\n    return lib.core.compute(3)\n",
    ),
    (
        "app/shadowed.py",
        "from lib.extra import *\n\n"
        "def helper():\n    return 2\n\n"
        "def run():\n    return helper()\n",
    ),
]


@pytest.fixture(scope="module")
def graph(spark):
    eng = GraphEngine(spark)
    nodes, edges, _ = eng.build(files_from_pairs(spark, FILES), "v1")
    return nodes.cache(), edges.cache()


def _calls(edges, src):
    return {
        r["dst"]
        for r in edges.filter(
            (F.col("rel_type") == "CALL") & (F.col("src") == src)
        ).collect()
    }


def test_from_import_asname(graph):
    _, edges = graph
    assert _calls(edges, "app.named_alias.run") == {"lib.core.compute"}


def test_import_module_asname(graph):
    _, edges = graph
    assert _calls(edges, "app.module_alias.run") == {"lib.core.compute"}


def test_plain_dotted_import(graph):
    _, edges = graph
    assert _calls(edges, "app.plain_import.run") == {"lib.core.compute"}


def test_local_symbol_shadows_star_import(graph):
    """Module-local helper beats the star-imported lib.extra.helper
    (resolution precedence rule 3 before rule 4)."""
    _, edges = graph
    assert _calls(edges, "app.shadowed.run") == {"app.shadowed.helper"}
