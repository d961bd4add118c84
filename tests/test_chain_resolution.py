"""r9 A4 chain shapes (VERDICT r8 item 1): extraction renders
call-chains with '()' markers and synthetic call-result slots, @property
methods emit field bindings, and the bounded deep walker resolves the
jedi-parity classes end-to-end (tools/deep_parity.py measures 100%/100%
against jedi's own goto on the same fixture)."""

from __future__ import annotations

import ast

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.extract.ast_extract import _dotted_chain, _extract_one
from codegraphdb_spark.mini_repo import PARITY_V1


def test_dotted_chain_rendering():
    cases = {
        "self.engine.gauge().read": "self.engine.gauge().read",
        "make_garage().car.drive": "make_garage().car.drive",
        "mod.f().x.y": "mod.f().x.y",
        "a.b.c": "a.b.c",
        "f()()": None,  # double call: dynamic, punt
        "x[0].y": None,  # subscript: dynamic, punt
    }
    for src, want in cases.items():
        assert _dotted_chain(ast.parse(src, mode="eval").body) == want


def test_chain_ref_facts_and_synthetic_slots():
    facts = _extract_one("parity/car.py", dict(PARITY_V1)["parity/car.py"])
    refs = {
        (f["full_name"], f["dst"], f["class"])
        for f in facts
        if f["fact"] == "ref" and f["kind"] == "CALL"
    }
    # mid-chain call: '()' marker, slot = the field
    assert (
        "parity.car.Car.service",
        "parity.car.Car.engine.gauge().read",
        "parity.car.Car.engine",
    ) in refs
    # head-call chain: slot = the call expression itself
    assert (
        "parity.car.drive_new",
        "make_garage().car.drive",
        "parity.car.drive_new::make_garage()",
    ) in refs
    assigns = {
        (f["full_name"], f["dst"]) for f in facts if f["fact"] == "assign"
    }
    # synthetic call-result slot binds to the callee
    assert ("parity.car.drive_new::make_garage()", "make_garage") in assigns
    # @property with annotated return is a typed field of the class
    assert ("parity.car.Dashboard.meter", "Meter") in assigns


def test_property_without_static_type_stays_unbound():
    src = (
        "class C:\n"
        "    @property\n"
        "    def x(self):\n"
        "        return self._whatever()\n"
    )
    facts = _extract_one("p/mod.py", src)
    assigns = {f["full_name"] for f in facts if f["fact"] == "assign"}
    assert "p.mod.C.x" not in assigns


@pytest.fixture(scope="module")
def parity_edges(spark):
    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.sources.repo import files_from_pairs

    eng = GraphEngine(spark, small_repo=True)
    _, edges, _ = eng.build(files_from_pairs(spark, PARITY_V1), "v1")
    return {
        (r["src"], r["dst"])
        for r in edges.filter(F.col("rel_type") == "CALL").collect()
    }


@pytest.mark.parametrize(
    "src, dst",
    [
        # C4: call-chained method hop resolves through the return table
        ("parity.car.Car.service", "parity.engine.Meter.read"),
        # C5: two-hop field chain
        ("parity.car.Garage.tune", "parity.engine.Engine.start"),
        # C6: three-hop field chain + call hop
        ("parity.car.Garage.deep_check", "parity.engine.Meter.read"),
        # C7: property hop
        ("parity.car.check_dash", "parity.engine.Meter.read"),
        # C8: local -> field -> field
        ("parity.car.fleet_check", "parity.engine.Engine.start"),
        # C9: factory-call head chain
        ("parity.car.drive_new", "parity.car.Car.drive"),
    ],
)
def test_chain_edges_resolve(parity_edges, src, dst):
    assert (src, dst) in parity_edges


def test_untyped_parameter_stays_unsolved(parity_edges):
    # C10: jedi's goto cannot resolve it either (DEEP_PARITY.md) — the
    # deliberate no-call-site-inference boundary
    assert ("parity.car.loan", "unsolved symbol") in parity_edges
    assert not any(
        s == "parity.car.loan" and d != "unsolved symbol"
        for s, d in parity_edges
    )


def test_scope_local_nested_defs_resolve(spark):
    """r10 LEGB L-step candidate: calls to defs NESTED in the caller
    resolve to src.target, and a local def SHADOWS a same-named import
    (DEEP_PARITY.md §2: this class was 282 of 285 missed edges on the
    real-repo measure)."""
    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.sources.repo import files_from_pairs

    src = (
        "def outer():\n"
        "    def inner(x):\n"
        "        return x + 1\n"
        "    return inner(3)\n"
        "\n"
        "class K:\n"
        "    def m(self):\n"
        "        def helper():\n"
        "            return 2\n"
        "        return helper()\n"
        "\n"
        "def shadow():\n"
        "    from p.other import thing\n"
        "    def thing():\n"
        "        return 9\n"
        "    return thing()\n"
    )
    other = "def thing():\n    return 1\n"
    eng = GraphEngine(spark, small_repo=True)
    _, edges, _ = eng.build(
        files_from_pairs(spark, [("p/mod.py", src), ("p/other.py", other)]),
        "v1",
    )
    calls = {
        (r["src"], r["dst"])
        for r in edges.filter(F.col("rel_type") == "CALL").collect()
    }
    assert ("p.mod.outer", "p.mod.outer.inner") in calls
    assert ("p.mod.K.m", "p.mod.K.m.helper") in calls
    # the local def wins over the imported name — Python shadowing
    assert ("p.mod.shadow", "p.mod.shadow.thing") in calls
    assert ("p.mod.shadow", "p.other.thing") not in calls


def test_enclosing_scope_instance_bindings(spark):
    """r10 LEGB E step (DEEP_PARITY.md §2 residual closed): a nested def
    calling methods on an instance variable bound in an ENCLOSING
    function resolves through the lexical chain — including two levels
    up — while (a) a local poison rebind suppresses the outer binding
    and (b) a method body never binds a bare name through a CLASS
    attribute (Python name lookup skips class scopes)."""
    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.sources.repo import files_from_pairs

    src = (
        "class Engine:\n"
        "    def compile(self):\n"
        "        return 1\n"
        "\n"
        "class K:\n"
        "    x = Engine()\n"
        "    def m(self):\n"
        "        return x.compile()\n"
        "\n"
        "def driver():\n"
        "    eng = Engine()\n"
        "    def side():\n"
        "        return eng.compile()\n"
        "    return side()\n"
        "\n"
        "def shadowed():\n"
        "    eng = Engine()\n"
        "    def side2():\n"
        "        eng = object_of_unknown()\n"
        "        return eng.compile()\n"
        "    return side2()\n"
        "\n"
        "def deep():\n"
        "    eng = Engine()\n"
        "    def mid():\n"
        "        def leaf():\n"
        "            return eng.compile()\n"
        "        return leaf()\n"
        "    return mid()\n"
    )
    eng = GraphEngine(spark, small_repo=True)
    _, edges, _ = eng.build(
        files_from_pairs(spark, [("p/mod.py", src)]), "v1"
    )
    calls = {
        (r["src"], r["dst"])
        for r in edges.filter(F.col("rel_type") == "CALL").collect()
    }
    assert ("p.mod.driver.side", "p.mod.Engine.compile") in calls
    assert ("p.mod.deep.mid.leaf", "p.mod.Engine.compile") in calls
    # poison local rebind suppresses the enclosing binding
    assert ("p.mod.shadowed.side2", "unsolved symbol") in calls
    assert ("p.mod.shadowed.side2", "p.mod.Engine.compile") not in calls
    # class attributes are not in a method's bare-name lookup chain
    assert ("p.mod.K.m", "unsolved symbol") in calls
    assert ("p.mod.K.m", "p.mod.Engine.compile") not in calls
