"""End-to-end robustness: index THIS repository's own source tree through
the full pipeline (scan_repo → build → queries). Real code exercises
extractor paths the mini fixture can't (decorators, lambdas, comprehensions,
nested defs, star-args, f-strings, try/except...)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.sources.repo import scan_repo


@pytest.fixture(scope="module")
def self_graph(spark):
    files = scan_repo(spark, "/root/repo/codegraphdb_spark")
    eng = GraphEngine(spark)
    nodes, edges, facts = eng.build(files, "self")
    return files, nodes.cache(), edges.cache(), facts


def test_scan_finds_sources(self_graph):
    files, _, _, _ = self_graph
    paths = {r["path"] for r in files.collect()}
    assert "engine.py" in paths
    assert "operators/merge.py" in paths
    assert all(p.endswith(".py") for p in paths)


def test_no_parse_errors_on_own_source(self_graph):
    _, _, _, facts = self_graph
    errs = facts.filter(F.col("fact") == "error").collect()
    assert errs == []


def test_realistic_symbol_counts(self_graph):
    _, nodes, edges, _ = self_graph
    by_kind = {r["kind"]: r["n"] for r in nodes.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert by_kind.get("MODULE", 0) >= 20
    assert by_kind.get("CLASS", 0) >= 3  # GraphEngine, GraphQueries, visitors...
    assert by_kind.get("FUNCTION", 0) >= 60
    assert by_kind.get("METHOD", 0) >= 20
    edge_types = {r["rel_type"] for r in edges.select("rel_type").distinct().collect()}
    assert {"CONTAINS", "HAS_METHOD", "CALL", "USES"} <= edge_types


def test_known_symbols_resolved(self_graph):
    _, nodes, edges, _ = self_graph
    eng_cls = nodes.filter(F.col("full_name") == "engine.GraphEngine").first()
    assert eng_cls is not None and eng_cls["kind"] == "CLASS"
    methods = {
        r["dst"]
        for r in edges.filter(
            (F.col("rel_type") == "HAS_METHOD") & (F.col("src") == "engine.GraphEngine")
        ).collect()
    }
    assert "engine.GraphEngine.build" in methods
    assert "engine.GraphEngine.update_version" in methods


def test_scan_decodes_special_path_chars(spark, tmp_path):
    """Paths with '+', spaces, and %-escapes round-trip through the
    URI-encoded input_file_name(): '+' must NOT decode to a space
    (form-encoding semantics) or git-diff change lists never match."""
    (tmp_path / "a+b.py").write_text("X = 1\n")
    (tmp_path / "with space.py").write_text("Y = 2\n")
    (tmp_path / "pct%20odd.py").write_text("Z = 3\n")
    paths = {r["path"] for r in scan_repo(spark, str(tmp_path)).collect()}
    assert paths == {"a+b.py", "with space.py", "pct%20odd.py"}
