"""Property-based tests of the pure-Python extraction kernel (_extract_one)
— no Spark session needed, so hypothesis can run many examples fast.

Invariants (reference semantics, SURVEY §1):
- extraction is deterministic;
- every local edge's src is an emitted node of this file or the module;
- every node's full_name is prefixed by the module name;
- kinds come from the fixed vocabulary;
- a syntax error yields exactly one error fact, never an exception;
- module-level calls never emit CALL refs (myClient.py:294).
"""

from __future__ import annotations

import keyword

from hypothesis import given, settings
from hypothesis import strategies as st

from codegraphdb_spark.datamodel import KINDS
from codegraphdb_spark.extract.ast_extract import _extract_one

# every keyword, not a hand-list: hypothesis found `or = 0` (invalid
# source the module-shape invariants don't apply to)
_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: not keyword.iskeyword(s)
)


@st.composite
def source_modules(draw):
    """Small random-but-valid Python modules: globals, functions, classes
    with methods/fields, calls and attribute uses."""
    lines: list[str] = []
    for _ in range(draw(st.integers(0, 2))):
        lines.append(f"{draw(_ident)} = {draw(st.integers(0, 99))}")
    for _ in range(draw(st.integers(0, 2))):
        fn = draw(_ident)
        callee = draw(_ident)
        lines.append(f"def {fn}(x):")
        lines.append(f"    return {callee}(x)")
    for _ in range(draw(st.integers(0, 2))):
        cls = draw(_ident)
        meth = draw(_ident)
        field = draw(_ident)
        base = draw(st.sampled_from(["", f"({draw(_ident)})"]))
        lines.append(f"class {cls}{base}:")
        lines.append(f"    {field} = 1")
        lines.append(f"    def {meth}(self):")
        lines.append(f"        self.{field} = 2")
        lines.append(f"        return self.{field}")
    if not lines:
        lines = ["pass"]
    return "\n".join(lines) + "\n"


@given(source_modules())
@settings(max_examples=60, deadline=None)
def test_extraction_invariants(source):
    facts = _extract_one("pkg/mod.py", source)
    assert facts == _extract_one("pkg/mod.py", source)  # deterministic

    nodes = [f for f in facts if f["fact"] == "node"]
    edges = [f for f in facts if f["fact"] == "edge"]
    node_names = {f["full_name"] for f in nodes}

    assert "pkg.mod" in node_names  # module node always present
    for f in nodes:
        assert f["kind"] in KINDS
        assert f["full_name"] == "pkg.mod" or f["full_name"].startswith("pkg.mod.")
    for e in edges:
        assert e["full_name"] in node_names  # local edge src always defined
        assert e["kind"] in {"CONTAINS", "HAS_METHOD", "HAS_FIELD"}


@given(st.text(alphabet="abcdef(:= \n", max_size=60))
@settings(max_examples=100, deadline=None)
def test_garbage_never_raises(text):
    facts = _extract_one("junk/bad.py", text)
    kinds = {f["fact"] for f in facts}
    assert kinds <= {"node", "edge", "import", "ref", "assign", "error"}


def test_module_level_calls_suppressed():
    facts = _extract_one("m.py", "print('hi')\nx = len([1])\n")
    assert not any(f["fact"] == "ref" and f["kind"] == "CALL" for f in facts)


def test_method_call_not_suppressed():
    facts = _extract_one("m.py", "def f():\n    return g()\n")
    calls = [f for f in facts if f["fact"] == "ref" and f["kind"] == "CALL"]
    assert [(c["full_name"], c["dst"]) for c in calls] == [("m.f", "g")]
