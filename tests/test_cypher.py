"""Cypher-subset front-end tests — including the reference's own query
shapes run verbatim (graphDB.py:269-272, ast_manage.py:24-62)."""

from __future__ import annotations

import pytest

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.plans.cypher import CypherError, run_cypher
from codegraphdb_spark.sources.repo import files_from_pairs
from tests.fixtures import mini_repo


@pytest.fixture(scope="module")
def graph(spark):
    eng = GraphEngine(spark)
    nodes, edges, _ = eng.build(files_from_pairs(spark, mini_repo.V1), "v1")
    return nodes.cache(), edges.cache()


def test_reference_c2_shape(graph):
    """MATCH (c:`task`:CLASS {name:'X'}) RETURN c — graphDB.py:269-272."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:`v1`:CLASS {name: 'Dog'}) RETURN c", nodes, edges
    ).collect()
    assert [(r["c_full_name"], r["c_kind"]) for r in out] == [("pkgb.dog.Dog", "CLASS")]


def test_reference_c3_shape(graph):
    """1-hop property-qualified expansion — ast_manage.py:24-35."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (m:MODULE {full_name: 'pkga.base'})-[:CONTAINS]->(c {name: 'Animal'}) "
        "RETURN c.full_name, labels(c)",
        nodes,
        edges,
    ).collect()
    assert len(out) == 1
    assert out[0]["c_full_name"] == "pkga.base.Animal"
    assert out[0]["labels_c"] == ["CLASS", "v1"]


def test_reference_c5_shape(graph):
    """Methods of class — ast_manage.py:52-62."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS {full_name: 'pkgb.dog.Dog'})-[:HAS_METHOD]->(m) "
        "RETURN m.full_name AS method",
        nodes,
        edges,
    ).collect()
    methods = {r["method"] for r in out}
    assert "pkgb.dog.Dog.fetch" in methods
    assert "pkga.base.Animal.speak" in methods  # closure-derived


def test_version_scan_and_limit(graph):
    nodes, edges = graph
    out = run_cypher("MATCH (m:`v1`) RETURN m.full_name LIMIT 3", nodes, edges).collect()
    assert len(out) == 3


def test_int_property_match(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (n {code_start: 1, kind: 'MODULE'}) RETURN n.full_name", nodes, edges
    ).collect()
    assert len(out) == 7  # every module spans from line 1


def test_errors_are_loud(graph):
    nodes, edges = graph
    with pytest.raises(CypherError):
        run_cypher("CREATE (n) RETURN n", nodes, edges)
    with pytest.raises(CypherError):
        run_cypher("MATCH (n) RETURN q.full_name", nodes, edges)
    with pytest.raises(CypherError):
        run_cypher("MATCH (n:CLASS:MODULE) RETURN n", nodes, edges)


def test_multi_hop_chain(graph):
    """(m)-[:CONTAINS]->(c)-[:HAS_METHOD]->(f): two-hop join chain.

    pkgb.dog CONTAINS both Dog (defined) and Animal (re-exported via the
    E2 import pass, ast_manage.py:101-125), so both classes' methods
    appear; Dog additionally carries Animal's non-__init__ methods from
    the E1 closure."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (m:MODULE {full_name: 'pkgb.dog'})-[:CONTAINS]->(c:CLASS)"
        "-[:HAS_METHOD]->(f) RETURN c.name AS cls, f.full_name AS method "
        "ORDER BY method, cls",
        nodes,
        edges,
    ).collect()
    assert [(r["cls"], r["method"]) for r in out] == [
        ("Animal", "pkga.base.Animal.__init__"),
        ("Animal", "pkga.base.Animal.describe"),
        ("Dog", "pkga.base.Animal.describe"),  # closure-derived
        ("Animal", "pkga.base.Animal.speak"),
        ("Dog", "pkga.base.Animal.speak"),
        ("Dog", "pkgb.dog.Dog.fetch"),
        ("Dog", "pkgb.dog.Dog.speak"),
    ]


def test_varlen_inherits_path(graph):
    """[:INHERITS*1..3] from Puppy reaches Dog (1 hop) and Animal (2)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (a:CLASS {name: 'Puppy'})-[:INHERITS*1..3]->(b) "
        "RETURN b.full_name AS base ORDER BY base",
        nodes,
        edges,
    ).collect()
    assert [r["base"] for r in out] == ["pkga.base.Animal", "pkgb.dog.Dog"]


def test_varlen_exact_hops(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (a:CLASS {name: 'Puppy'})-[:INHERITS*2]->(b) RETURN b.name",
        nodes,
        edges,
    ).collect()
    assert [r["b_name"] for r in out] == ["Animal"]


def test_where_clause(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(f) "
        "WHERE c.full_name STARTS WITH 'pkgb' AND f.name <> 'speak' "
        "AND f.name IN ['fetch', 'whine', 'describe'] "
        "RETURN DISTINCT f.name AS m ORDER BY m",
        nodes,
        edges,
    ).collect()
    assert [r["m"] for r in out] == ["describe", "fetch", "whine"]


def test_count_aggregate(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:`v1`:CLASS) RETURN count(c) AS n", nodes, edges
    ).collect()
    assert out[0]["n"] == 3  # Animal, Dog, Puppy


def test_varlen_cap_is_loud(graph):
    nodes, edges = graph
    with pytest.raises(CypherError):
        run_cypher(
            "MATCH (a)-[:INHERITS*1..99]->(b) RETURN a.name", nodes, edges
        )
    # an unparseable predicate still raises
    with pytest.raises(CypherError):
        run_cypher(
            "MATCH (c) WHERE c.name ~~~ 'D.*' RETURN c",
            nodes,
            edges,
        )


def test_regex_operator_whole_string(graph):
    """=~ matches the WHOLE string (Neo4j semantics), not a substring:
    'og' alone must match nothing even though two names contain it."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) WHERE c.name =~ 'D.*' RETURN c.name AS nm", nodes, edges
    ).collect()
    assert [r["nm"] for r in out] == ["Dog"]
    out = run_cypher(
        "MATCH (c:CLASS) WHERE c.name =~ 'og' RETURN c.name AS nm", nodes, edges
    ).collect()
    assert out == []


def test_query_parameters(graph):
    """$param in property maps and WHERE values (Neo4j parameter surface)."""
    nodes, edges = graph
    q = "MATCH (c:CLASS {name: $who}) RETURN c.full_name AS fn"
    out = run_cypher(q, nodes, edges, params={"who": "Dog"}).collect()
    assert [r["fn"] for r in out] == ["pkgb.dog.Dog"]
    out = run_cypher(
        "MATCH (c:CLASS) WHERE c.name IN $names RETURN c.name AS nm "
        "ORDER BY nm",
        nodes,
        edges,
        params={"names": ["Dog", "Puppy"]},
    ).collect()
    assert [r["nm"] for r in out] == ["Dog", "Puppy"]
    # missing / unusable parameters raise instead of silently matching
    with pytest.raises(CypherError, match="missing query parameter"):
        run_cypher(q, nodes, edges)
    with pytest.raises(CypherError, match="must be a str"):
        run_cypher(q, nodes, edges, params={"who": object()})


# --- round-3 breadth: reverse/undirected edges, comma chains, boolean WHERE ---


def test_reverse_edge(graph):
    """(m)<-[:HAS_METHOD]-(c): the arrow direction flips the join columns,
    not the result semantics (graphDB.py:279-281 uses both orientations)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (m)<-[:HAS_METHOD]-(c:CLASS {name: 'Dog'}) "
        "RETURN m.full_name AS method ORDER BY method",
        nodes,
        edges,
    ).collect()
    assert [r["method"] for r in out] == [
        "pkga.base.Animal.describe",
        "pkga.base.Animal.speak",
        "pkgb.dog.Dog.fetch",
        "pkgb.dog.Dog.speak",
    ]


def test_undirected_edge(graph):
    """-[:INHERITS]- matches the edge in either orientation: Dog inherits
    Animal (outgoing) and is inherited by Puppy (incoming)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (a:CLASS {name: 'Dog'})-[:INHERITS]-(b) "
        "RETURN b.full_name AS other ORDER BY other",
        nodes,
        edges,
    ).collect()
    assert [r["other"] for r in out] == ["pkga.base.Animal", "pkgb.puppy.Puppy"]


def test_comma_chains_shared_variable(graph):
    """Comma-separated chains; the repeated variable c means the SAME node
    (identity equality), so only Animal's direct subclass survives."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (m)<-[:HAS_METHOD]-(c), (c)-[:INHERITS]->(b:CLASS {name: 'Animal'}) "
        "RETURN DISTINCT c.full_name AS cls",
        nodes,
        edges,
    ).collect()
    assert [r["cls"] for r in out] == ["pkgb.dog.Dog"]


def test_comma_chains_disjoint_product(graph):
    """Disjoint chains with no shared variable form a product — but ONLY
    with the explicit opt-in; by default a disconnected chain refuses
    loudly (a typo there silently plans an N² join at scale)."""
    nodes, edges = graph
    q = (
        "MATCH (a:CLASS {name: 'Dog'}), (m:MODULE {full_name: 'pkga.base'}) "
        "RETURN a.full_name AS cls, m.full_name AS mod"
    )
    with pytest.raises(CypherError, match="cartesian"):
        run_cypher(q, nodes, edges)
    out = run_cypher(q, nodes, edges, allow_cartesian=True).collect()
    assert [(r["cls"], r["mod"]) for r in out] == [("pkgb.dog.Dog", "pkga.base")]


def test_where_boolean_logic(graph):
    """OR / NOT / parentheses with standard precedence (OR < AND < NOT)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) WHERE c.name = 'Dog' "
        "OR (c.name STARTS WITH 'Pup' AND NOT c.name = 'Animal') "
        "RETURN c.full_name AS cls ORDER BY cls",
        nodes,
        edges,
    ).collect()
    assert [r["cls"] for r in out] == ["pkgb.dog.Dog", "pkgb.puppy.Puppy"]


def test_task_id_label_parses(graph):
    """The reference writes task-partition labels with slashes, unbackticked:
    MATCH (c:project_cc_python/102:CLASS) — graphDB.py:284. Must parse as a
    version label (0 rows here: this graph is version v1)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:project_cc_python/102:CLASS) RETURN c", nodes, edges
    ).collect()
    assert out == []
    out = run_cypher("MATCH (c:v1:CLASS) RETURN count(*) AS n", nodes, edges).collect()
    assert out[0]["n"] == 3


def test_bidirectional_edge_is_loud(graph):
    nodes, edges = graph
    with pytest.raises(CypherError):
        run_cypher("MATCH (a)<-[:INHERITS]->(b) RETURN a.name", nodes, edges)


def test_code_pointer_property(graph):
    """The reference's HAS_METHOD smoke query (graphDB.py:279-282) returns
    m.code — stored there as the lazy <CODE>{"S":..,"E":..,"F":..}</CODE>
    pointer property (myClient.py:236-257). The graph keeps the typed
    triple; x.code must re-serialize to the identical wire format, and
    ORDER BY must resolve var.prop through an explicit RETURN alias."""
    nodes, edges = graph
    out = run_cypher(
        'MATCH (c:CLASS {name: "Dog"})-[:HAS_METHOD]->(m:METHOD) '
        "RETURN m.name AS MethodName, m.signature AS MethodSignature, "
        "m.code AS MethodCode ORDER BY m.name",
        nodes,
        edges,
    ).collect()
    names = [r["MethodName"] for r in out]
    assert names == sorted(names) and {"fetch", "speak"} <= set(names)
    assert all(
        r["MethodCode"].startswith('<CODE>{"S":') and r["MethodCode"].endswith("</CODE>")
        for r in out
    )
    fetch = next(r for r in out if r["MethodName"] == "fetch")
    assert '"F":"pkgb/dog.py"' in fetch["MethodCode"]


def test_optional_match_left_join(graph):
    """OPTIONAL MATCH preserves unmatched rows with NULLs (left join on the
    shared variable): Animal has no INHERITS out-edge."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) OPTIONAL MATCH (c)-[:INHERITS]->(b) "
        "RETURN c.name AS cls, b.name AS base ORDER BY cls",
        nodes,
        edges,
    ).collect()
    assert [(r["cls"], r["base"]) for r in out] == [
        ("Animal", None),
        ("Dog", "Animal"),
        ("Puppy", "Dog"),
    ]


def test_optional_match_scoped_where(graph):
    """A WHERE after OPTIONAL MATCH filters the optional pattern BEFORE the
    left join (Cypher semantics) — classes without a 'fetch' method keep
    their row with NULL, they are not eliminated."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) OPTIONAL MATCH (c)-[:HAS_METHOD]->(m) "
        "WHERE m.name = 'fetch' "
        "RETURN c.name AS cls, m.full_name AS fetcher ORDER BY cls",
        nodes,
        edges,
    ).collect()
    got = [(r["cls"], r["fetcher"]) for r in out]
    assert ("Animal", None) in got
    assert ("Dog", "pkgb.dog.Dog.fetch") in got
    assert all(f in (None, "pkgb.dog.Dog.fetch") for _, f in got)


def test_optional_match_requires_shared_variable(graph):
    nodes, edges = graph
    with pytest.raises(CypherError):
        run_cypher(
            "MATCH (c:CLASS) OPTIONAL MATCH (m:MODULE) RETURN c.name",
            nodes,
            edges,
        )


def test_edge_property_filter(graph):
    """Edge property maps: the reference writes association_type on
    CONTAINS edges (myClient.py:187-194) and filters on it in its C4
    helper (ast_manage.py:106-121)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (m:MODULE {full_name: 'pkgb.dog'})"
        "-[:CONTAINS {association_type: 'CLASS'}]->(c) "
        "RETURN c.full_name AS cls ORDER BY cls",
        nodes,
        edges,
    ).collect()
    assert [r["cls"] for r in out] == ["pkga.base.Animal", "pkgb.dog.Dog"]
    # a non-matching edge property filters everything out, loudly nothing
    out = run_cypher(
        "MATCH (m:MODULE {full_name: 'pkgb.dog'})"
        "-[:CONTAINS {association_type: 'FUNCTION'}]->(c) RETURN c",
        nodes,
        edges,
    ).collect()
    assert out == []
    with pytest.raises(CypherError):
        run_cypher(
            "MATCH (a)-[:INHERITS*1..2 {association_type: 'CLASS'}]->(b) "
            "RETURN a.name",
            nodes,
            edges,
        )


def test_implicit_grouping_counts(graph):
    """RETURN mixing properties with aggregates groups by the properties
    (Cypher implicit grouping)."""
    from pyspark.sql import functions as F

    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "RETURN c.full_name AS cls, count(m) AS n ORDER BY cls",
        nodes,
        edges,
    ).collect()
    expected = {
        r["src"]: r["n"]
        for r in edges.filter(F.col("rel_type") == "HAS_METHOD")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["cls"]: r["n"] for r in out}
    assert got == expected and got


def test_collect_is_sorted(graph):
    from pyspark.sql import functions as F

    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS {name: 'Dog'})-[:HAS_METHOD]->(m) "
        "RETURN collect(m.full_name) AS methods",
        nodes,
        edges,
    ).collect()
    expected = sorted(
        r["dst"]
        for r in edges.filter(
            (F.col("rel_type") == "HAS_METHOD") & (F.col("src") == "pkgb.dog.Dog")
        ).collect()
    )
    assert out[0]["methods"] == expected


def test_exists_and_is_null(graph):
    from pyspark.sql import functions as F

    nodes, edges = graph
    with_path = run_cypher(
        "MATCH (n) WHERE exists(n.file_path) RETURN count(*) AS n",
        nodes,
        edges,
    ).collect()[0]["n"]
    null_path = run_cypher(
        "MATCH (n) WHERE n.file_path IS NULL RETURN count(*) AS n",
        nodes,
        edges,
    ).collect()[0]["n"]
    not_exists = run_cypher(
        "MATCH (n) WHERE NOT exists(n.file_path) RETURN count(*) AS n",
        nodes,
        edges,
    ).collect()[0]["n"]
    assert with_path == nodes.filter(F.col("file_path").isNotNull()).count()
    assert null_path == not_exists == nodes.count() - with_path
    is_not_null = run_cypher(
        "MATCH (n) WHERE n.file_path IS NOT NULL RETURN count(*) AS n",
        nodes,
        edges,
    ).collect()[0]["n"]
    assert is_not_null == with_path


def test_skip_paginates(graph):
    nodes, edges = graph
    all_rows = run_cypher(
        "MATCH (c:CLASS) RETURN c.full_name AS fn ORDER BY fn",
        nodes,
        edges,
    ).collect()
    page = run_cypher(
        "MATCH (c:CLASS) RETURN c.full_name AS fn ORDER BY fn SKIP 1 LIMIT 2",
        nodes,
        edges,
    ).collect()
    assert [r["fn"] for r in page] == [r["fn"] for r in all_rows][1:3]


def test_with_having_filters_aggregate(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "WITH c, count(m) AS n WHERE n > 3 "
        "RETURN c.full_name AS cls, n ORDER BY cls",
        nodes,
        edges,
    ).collect()
    # v1 fixture: Dog has speak+fetch+inherited describe+inherited speak
    assert all(r["n"] > 3 for r in out)
    base = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "RETURN c.full_name AS cls, count(m) AS n",
        nodes,
        edges,
    ).collect()
    expected = sorted(r["cls"] for r in base if r["n"] > 3)
    assert [r["cls"] for r in out] == expected


def test_with_pipeline_into_second_match(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "WITH c, count(m) AS n "
        "MATCH (c)-[:INHERITS]->(b) "
        "RETURN c.name AS cls, b.name AS base, n ORDER BY cls",
        nodes,
        edges,
    ).collect()
    got = {(r["cls"], r["base"]) for r in out}
    assert got == {("Dog", "Animal"), ("Puppy", "Dog")}
    assert all(r["n"] >= 1 for r in out)


def test_with_projection_and_alias_filter(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) WITH c.name AS nm WHERE nm STARTS WITH 'D' RETURN nm",
        nodes,
        edges,
    ).collect()
    assert [r["nm"] for r in out] == ["Dog"]


def test_with_aggregate_of_aggregate(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "WITH c, count(m) AS n RETURN max(n) AS max_methods",
        nodes,
        edges,
    ).collect()
    per_class = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) RETURN c.name AS c, count(m) AS n",
        nodes,
        edges,
    ).collect()
    assert out[0]["max_methods"] == max(r["n"] for r in per_class)


def test_starts_with_not_parsed_as_with_clause(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) WHERE c.full_name STARTS WITH 'pkgb' "
        "RETURN count(*) AS n",
        nodes,
        edges,
    ).collect()
    assert out[0]["n"] == 2


def test_double_with_stage_chain(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "WITH c, count(m) AS n "
        "WITH n WHERE n > 3 "
        "RETURN n ORDER BY n",
        nodes,
        edges,
    ).collect()
    per_class = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) RETURN c.name AS c, count(m) AS n",
        nodes,
        edges,
    ).collect()
    assert sorted(r["n"] for r in out) == sorted(
        r["n"] for r in per_class if r["n"] > 3
    )


def test_with_distinct_node_variable_dedupes(graph):
    """WITH DISTINCT over a bare node variable dedupes on the node's full
    column set: a class with several methods appears once downstream.
    (Was a refusal test before WITH DISTINCT projection support landed.)"""
    nodes, edges = graph
    rows = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) WITH DISTINCT c "
        "RETURN c.name ORDER BY c.name",
        nodes,
        edges,
    ).collect()
    names = [r[0] for r in rows]
    assert names == sorted(set(names)) and names
    # DISTINCT alongside an aggregate is ACCEPTED since r6 (openCypher
    # semantics: DISTINCT applies to the result rows post-aggregation —
    # a provable no-op under implicit grouping) and must equal the
    # DISTINCT-free form
    with_d = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "RETURN DISTINCT c.name AS n, count(m) AS k ORDER BY n",
        nodes,
        edges,
    ).collect()
    without = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "RETURN c.name AS n, count(m) AS k ORDER BY n",
        nodes,
        edges,
    ).collect()
    assert with_d == without and with_d


# --- round-3 review fixes: regression coverage --------------------------------

def test_unparseable_property_raises(graph):
    """A property value the subset can't parse must error, never silently
    drop the filter and over-match."""
    nodes, edges = graph
    for q in (
        "MATCH (n:CLASS {name: Dog}) RETURN n",       # unquoted string
        "MATCH (n:CLASS {flag: true}) RETURN n",      # boolean literal
        "MATCH (n {code_start: -1}) RETURN n",        # negative number
    ):
        with pytest.raises(CypherError):
            run_cypher(q, nodes, edges)


def test_ends_with_predicate(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (n:CLASS) WHERE n.name ENDS WITH 'og' RETURN n.name AS nm",
        nodes,
        edges,
    ).collect()
    assert [r["nm"] for r in out] == ["Dog"]


def test_undirected_varlen_mixes_orientations(graph):
    """Dog->Animal and Puppy->Dog: the undirected 2-path Animal-Dog-Puppy
    must be reachable from Animal even though both edges point AT it."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (a:CLASS {name: 'Animal'})-[:INHERITS*1..2]-(b:CLASS) "
        "RETURN b.name AS nm ORDER BY nm",
        nodes,
        edges,
    ).collect()
    # openCypher relationship uniqueness: 'Animal' itself is NOT in the
    # result — the only length-2 route back (Dog->Animal forward then the
    # SAME edge backward) reuses one relationship, which Neo4j excludes
    assert sorted(r["nm"] for r in out) == ["Dog", "Puppy"]


def test_null_code_pointer_renders_null(graph):
    """Nodes without a code pointer (placeholder endpoints; unmatched
    OPTIONAL rows) render code as NULL like Neo4j — never '<CODE>{}</CODE>'.
    (Modules DO carry a full-file pointer in this engine.)"""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (n:none) RETURN n.full_name AS fn, n.code AS code",
        nodes,
        edges,
    ).collect()
    assert out and all(r["code"] is None for r in out)


def test_where_after_match_sees_with_alias(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "WITH c, count(m) AS n "
        "MATCH (c)-[:INHERITS]->(b) WHERE n > 3 "
        "RETURN c.name AS cls, n ORDER BY cls",
        nodes,
        edges,
    ).collect()
    assert all(r["n"] > 3 for r in out) and out


def test_quote_scanner_handles_apostrophe_in_double_quotes(graph):
    nodes, edges = graph
    out = run_cypher(
        'MATCH (c:CLASS {name: "Dog"})-[:HAS_METHOD]->(m) '
        "WITH c, count(m) AS n RETURN n",
        nodes,
        edges,
    ).collect()
    assert len(out) == 1
    # an apostrophe inside a double-quoted literal must not hide the WITH
    out2 = run_cypher(
        'MATCH (c:CLASS) WHERE c.name <> "do\'nt" '
        "WITH c.name AS nm WHERE nm = 'Dog' RETURN nm",
        nodes,
        edges,
    ).collect()
    assert [r["nm"] for r in out2] == ["Dog"]


def test_with_rebinds_node_variable(graph):
    """WITH c AS x keeps x a full node binding: whole-node RETURN works
    and a following MATCH can extend from x."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS {name: 'Dog'}) WITH c AS x "
        "MATCH (x)-[:INHERITS]->(b) RETURN x.name AS cls, b.name AS base",
        nodes,
        edges,
    ).collect()
    assert [(r["cls"], r["base"]) for r in out] == [("Dog", "Animal")]
    whole = run_cypher(
        "MATCH (c:CLASS {name: 'Dog'}) WITH c AS x RETURN x", nodes, edges
    ).collect()
    assert whole[0]["x_full_name"] == "pkgb.dog.Dog"
    assert whole[0]["x_kind"] == "CLASS"


def test_unwind_match_where(graph):
    """UNWIND rows multiply against the MATCH and the unwound column is
    usable in WHERE (column-to-column compare) and RETURN."""
    nodes, edges = graph
    out = run_cypher(
        "UNWIND ['Dog', 'Puppy', 'Nope'] AS nm "
        "MATCH (c:CLASS) WHERE c.name = nm "
        "RETURN c.full_name AS fn ORDER BY fn",
        nodes,
        edges,
    ).collect()
    assert [r["fn"] for r in out] == ["pkgb.dog.Dog", "pkgb.puppy.Puppy"]


def test_unwind_pure_return(graph):
    nodes, edges = graph
    out = run_cypher(
        "UNWIND [3, 1, 2] AS x RETURN x ORDER BY x", nodes, edges
    ).collect()
    assert [r["x"] for r in out] == [1, 2, 3]


def test_unwind_param_list(graph):
    nodes, edges = graph
    out = run_cypher(
        "UNWIND $names AS nm MATCH (c:CLASS) WHERE c.name = nm "
        "RETURN nm, c.file_path AS fp ORDER BY nm",
        nodes,
        edges,
        params={"names": ["Animal", "Dog"]},
    ).collect()
    assert [(r["nm"], r["fp"]) for r in out] == [
        ("Animal", "pkga/base.py"),
        ("Dog", "pkgb/dog.py"),
    ]


def test_unwind_rejects_heterogeneous(graph):
    nodes, edges = graph
    with pytest.raises(CypherError):
        run_cypher("UNWIND [1, 'a'] AS x RETURN x", nodes, edges)


def test_shortest_path_length(graph):
    """p = shortestPath((a)-[:R*]->(b)) + length(p): min-hop distances
    (Puppy -> Dog is 1 hop, Puppy -> Animal is 2, even though *1..5 would
    also admit longer walks if the graph had them)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH p = shortestPath((a:CLASS {name: 'Puppy'})-[:INHERITS*1..5]->(b)) "
        "RETURN b.name AS base, length(p) AS hops ORDER BY hops",
        nodes,
        edges,
    ).collect()
    assert [(r["base"], r["hops"]) for r in out] == [("Dog", 1), ("Animal", 2)]


def test_shortest_path_requires_varlen(graph):
    nodes, edges = graph
    with pytest.raises(CypherError, match="var-length"):
        run_cypher(
            "MATCH p = shortestPath((a:CLASS)-[:INHERITS]->(b)) "
            "RETURN length(p)",
            nodes,
            edges,
        )
    with pytest.raises(CypherError, match="path variable"):
        run_cypher("MATCH (a:CLASS) RETURN length(a)", nodes, edges)


def test_intra_chain_cycle_does_not_bypass_cartesian_guard(graph):
    """A later chain that repeats its OWN variable (a cycle) is still
    disconnected from earlier chains — the rebind must not exempt it from
    the product refusal (review finding: intra_eq growth was misread as
    cross-chain connectivity)."""
    nodes, edges = graph
    q = (
        "MATCH (a:CLASS {name: 'Dog'}), (b:MODULE)-[:CONTAINS]->(b) "
        "RETURN a.full_name AS cls"
    )
    with pytest.raises(CypherError, match="cartesian"):
        run_cypher(q, nodes, edges)


def test_unwind_empty_list_yields_zero_rows(graph):
    """openCypher: UNWIND of an empty list produces no rows, not an
    error — a dynamically-computed empty $param list is legitimate."""
    nodes, edges = graph
    out = run_cypher(
        "UNWIND $names AS nm MATCH (c:CLASS) WHERE c.name = nm "
        "RETURN nm, c.full_name AS cls",
        nodes,
        edges,
        params={"names": []},
    ).collect()
    assert out == []


def test_fixed_path_projection(graph):
    """p = (fixed chain): nodes(p)/relationships(p)/length(p) project the
    statically-known alias sequence; var-length chains refuse (only
    shortestPath carries a path var there)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH p = (c:CLASS {name: 'Dog'})-[:INHERITS]->(b) "
        "RETURN nodes(p) AS pn, relationships(p) AS pr, length(p) AS n",
        nodes,
        edges,
    ).collect()
    assert len(out) == 1
    assert out[0]["pn"] == ["pkgb.dog.Dog", "pkga.base.Animal"]
    assert out[0]["pr"] == ["INHERITS"]
    assert out[0]["n"] == 1
    with pytest.raises(CypherError, match="var-length"):
        run_cypher(
            "MATCH p = (a:CLASS)-[:INHERITS*1..2]->(b) RETURN nodes(p)",
            nodes,
            edges,
        )


def test_unwind_node_array_property(graph):
    """UNWIND over an array PROPERTY (n.versions) explodes per Cypher
    row-multiplication — previously only literal/$param lists unwound."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS {name: 'Dog'}) UNWIND c.versions AS v "
        "RETURN c.full_name AS cls, v ORDER BY v",
        nodes,
        edges,
    ).collect()
    assert [(r["cls"], r["v"]) for r in out] == [("pkgb.dog.Dog", "v1")]
    with pytest.raises(CypherError, match="not a property"):
        run_cypher(
            "MATCH (c:CLASS) UNWIND c.nope AS v RETURN v", nodes, edges
        )


def test_pattern_predicate_semi(graph):
    """WHERE (c)-[:INHERITS]->(:CLASS) — existential pattern predicate
    compiles to a LEFT SEMI join (Neo4j sugar for EXISTS)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) WHERE (c)-[:INHERITS]->(:CLASS) "
        "RETURN c.name AS name ORDER BY name",
        nodes,
        edges,
    ).collect()
    assert [r["name"] for r in out] == ["Dog", "Puppy"]


def test_pattern_predicate_anti(graph):
    """WHERE NOT (c)-[:INHERITS]->(:CLASS) — negated predicate is a LEFT
    ANTI join; only the inheritance roots survive."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) WHERE NOT (c)-[:INHERITS]->(:CLASS) "
        "RETURN c.name AS name ORDER BY name",
        nodes,
        edges,
    ).collect()
    assert [r["name"] for r in out] == ["Animal"]


def test_pattern_predicate_mixed_with_column_filter(graph):
    """Pattern predicates coexist with plain predicates under AND; rows
    survive only when both hold. HAS_METHOD includes closure-derived
    edges, so every class 'has' speak."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) WHERE (c)-[:HAS_METHOD]->(:METHOD {name: 'speak'}) "
        "AND c.name <> 'Dog' RETURN c.name AS name ORDER BY name",
        nodes,
        edges,
    ).collect()
    assert [r["name"] for r in out] == ["Animal", "Puppy"]


def test_pattern_predicate_does_not_export_variables(graph):
    """Variables bound INSIDE a pattern predicate are not in scope after
    it (openCypher existential scoping)."""
    nodes, edges = graph
    with pytest.raises(CypherError, match="unbound"):
        run_cypher(
            "MATCH (c:CLASS) WHERE (c)-[:HAS_METHOD]->(m) RETURN m.name",
            nodes,
            edges,
        )


def test_pattern_predicate_requires_bound_variable(graph):
    """A predicate chain that shares no variable with the MATCH scope is
    refused loudly (it would be a constant existence test)."""
    nodes, edges = graph
    with pytest.raises(CypherError, match="bound variable"):
        run_cypher(
            "MATCH (c:CLASS) WHERE (x:MODULE)-[:CONTAINS]->(y) RETURN c.name",
            nodes,
            edges,
        )


def test_pattern_predicate_under_or_refused(graph):
    """Semi-joins cannot be disjoined with a column filter — a pattern
    predicate under OR fails loudly, never silently drops the branch."""
    nodes, edges = graph
    with pytest.raises(CypherError, match="cannot parse WHERE predicate"):
        run_cypher(
            "MATCH (c:CLASS) WHERE c.name = 'Dog' OR (c)-[:INHERITS]->(:CLASS) "
            "RETURN c.name",
            nodes,
            edges,
        )


def test_exists_subquery(graph):
    """EXISTS { MATCH ... WHERE ... } — the modern openCypher existential;
    the inner WHERE filters the subquery before the semi-join."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) WHERE EXISTS { MATCH (c)-[:HAS_METHOD]->(m:METHOD) "
        "WHERE m.name = 'fetch' } RETURN c.name AS name ORDER BY name",
        nodes,
        edges,
    ).collect()
    assert [r["name"] for r in out] == ["Dog", "Puppy"]  # Puppy via closure
    # negated, shorthand body (no MATCH keyword), AND-combined
    out = run_cypher(
        "MATCH (c:CLASS) WHERE NOT EXISTS { (c)-[:INHERITS]->(:CLASS) } "
        "AND c.name <> 'nope' RETURN c.name AS name",
        nodes,
        edges,
    ).collect()
    assert [r["name"] for r in out] == ["Animal"]


def test_exists_subquery_inner_where_scope(graph):
    """The inner WHERE sees only variables the inner pattern binds."""
    nodes, edges = graph
    with pytest.raises(CypherError, match="unbound"):
        run_cypher(
            "MATCH (c:CLASS)-[:HAS_METHOD]->(z) WHERE EXISTS { "
            "MATCH (c)-[:INHERITS]->(b) WHERE z.name = 'x' } RETURN c.name",
            nodes,
            edges,
        )


def test_case_expression(graph):
    """Searched CASE in RETURN: full WHERE grammar in conditions,
    property/literal values, NULL when no ELSE."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) RETURN c.name AS name, "
        "CASE WHEN c.name = 'Animal' THEN 'root' "
        "WHEN c.name STARTS WITH 'P' THEN 'leafish' "
        "ELSE c.file_path END AS tier ORDER BY name",
        nodes,
        edges,
    ).collect()
    assert [(r["name"], r["tier"]) for r in out] == [
        ("Animal", "root"),
        ("Dog", "pkgb/dog.py"),
        ("Puppy", "leafish"),
    ]
    # no ELSE → NULL branch; CASE output also groups implicitly
    out = run_cypher(
        "MATCH (c:CLASS) RETURN CASE WHEN c.name = 'Dog' THEN 'dog' END "
        "AS tag, count(c) AS n ORDER BY n",
        nodes,
        edges,
    ).collect()
    assert sorted([(r["tag"], r["n"]) for r in out], key=str) == [
        ("dog", 1),
        (None, 2),
    ]


def test_count_and_collect_distinct(graph):
    """count(DISTINCT x) / collect(DISTINCT x) — HAS_METHOD closure
    produces duplicate method NAMES per class (own override + inherited
    copy), which DISTINCT collapses."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS {name: 'Dog'})-[:HAS_METHOD]->(m) "
        "RETURN count(m.name) AS n_all, count(DISTINCT m.name) AS n_uniq, "
        "collect(DISTINCT m.name) AS names",
        nodes,
        edges,
    ).collect()
    r = out[0]
    assert r["n_all"] > r["n_uniq"]
    assert sorted(set(r["names"])) == sorted(r["names"])  # deduped, sorted


def test_scalar_functions(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS {name: 'Dog'}) "
        "RETURN c.name AS n, toUpper(c.name) AS up, toLower(c.name) AS lo, "
        "size(c.versions) AS nv, size(c.name) AS slen, "
        "coalesce(c.signature, 'none') AS sig, "
        "substring(c.full_name, 0, 4) AS pre4, "
        "substring(c.full_name, 5) AS rest, "
        "replace(c.name, 'o', '0') AS leet, trim(c.name) AS t",
        nodes,
        edges,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["up"] == "DOG" and r["lo"] == "dog"
    assert r["nv"] == 1          # array property → list size
    assert r["slen"] == 3        # string property → char length
    assert r["pre4"] == "pkgb"   # 0-based start, Cypher semantics
    assert r["rest"] == "dog.Dog"
    assert r["leet"] == "D0g"
    assert r["t"] == "Dog"
    assert r["sig"].startswith("class Dog")


def test_scalar_function_errors(graph):
    nodes, edges = graph
    with pytest.raises(CypherError, match="start must be"):
        run_cypher(
            "MATCH (c:CLASS) RETURN substring(c.name, -1, 2)", nodes, edges
        )
    with pytest.raises(CypherError, match="exactly one"):
        run_cypher("MATCH (c:CLASS) RETURN size(c.name, c.name)", nodes, edges)
    with pytest.raises(CypherError):
        # nested calls are outside the subset — must refuse, not mis-parse
        run_cypher(
            "MATCH (c:CLASS) RETURN toUpper(substring(c.name, 0, 2))",
            nodes, edges,
        )


def test_with_order_by_limit(graph):
    """Mid-pipeline top-N: WITH ... ORDER BY ... LIMIT cuts the carried
    scope before the next MATCH (Neo4j sub-clause semantics)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "WITH c, count(m) AS n ORDER BY n DESC, c.full_name LIMIT 1 "
        "MATCH (c)-[:HAS_METHOD]->(m2) RETURN c.name AS cls, m2.name AS meth "
        "ORDER BY meth",
        nodes,
        edges,
    ).collect()
    classes = {r["cls"] for r in out}
    assert len(classes) == 1  # only the top-1 class survived the WITH cut
    assert len(out) >= 2


def test_with_order_by_skip_and_where_after_limit(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) "
        "WITH c.full_name AS fn ORDER BY fn SKIP 1 LIMIT 2 "
        "WHERE fn STARTS WITH 'pkg' RETURN fn",
        nodes,
        edges,
    ).collect()
    all_fns = sorted(
        r["fn"]
        for r in run_cypher(
            "MATCH (c:CLASS) RETURN c.full_name AS fn", nodes, edges
        ).collect()
    )
    expected = [fn for fn in all_fns[1:3] if fn.startswith("pkg")]
    assert [r["fn"] for r in out] == expected


def test_with_limit_without_order_refused(graph):
    nodes, edges = graph
    with pytest.raises(CypherError, match="requires ORDER BY"):
        run_cypher(
            "MATCH (c:CLASS) WITH c LIMIT 2 RETURN c.name", nodes, edges
        )


def test_sum_avg_aggregates(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS {name: 'Dog'})-[:HAS_METHOD]->(m) "
        "RETURN sum(m.code_start) AS s, avg(m.code_start) AS a, "
        "count(m) AS n",
        nodes,
        edges,
    ).collect()[0]
    assert out["s"] is not None and out["n"] > 0
    assert abs(out["a"] - out["s"] / out["n"]) < 1e-12
    # avg(DISTINCT): dedupe before averaging (VERDICT r4's last refusal
    # corner) — must equal sum(DISTINCT)/count(DISTINCT) exactly (one IEEE
    # division over exact int sum/count on both paths)
    d = run_cypher(
        "MATCH (c:CLASS)-[:HAS_METHOD]->(m) "
        "RETURN avg(DISTINCT m.code_start) AS a, "
        "sum(DISTINCT m.code_start) AS s, "
        "count(DISTINCT m.code_start) AS n",
        nodes, edges,
    ).collect()[0]
    assert d["a"] == d["s"] / d["n"]


def test_relationship_variable_props(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (m:MODULE {full_name: 'pkga.base'})-[r:CONTAINS]->(c) "
        "WHERE r.association_type = 'CLASS' "
        "RETURN c.full_name AS child, r.association_type AS assoc "
        "ORDER BY child",
        nodes,
        edges,
    ).collect()
    assert out and all(r["assoc"] == "CLASS" for r in out)
    assert all(r["child"].startswith("pkga.base.") for r in out)


def test_relationship_variable_refusals(graph):
    nodes, edges = graph
    with pytest.raises(CypherError, match="single hop"):
        run_cypher(
            "MATCH (a)-[r:INHERITS*1..2]->(b) RETURN r.rel_type", nodes, edges
        )
    with pytest.raises(CypherError, match="DIRECTED"):
        run_cypher(
            "MATCH (a)-[r:INHERITS]-(b) RETURN r.rel_type", nodes, edges
        )
    with pytest.raises(CypherError, match="not the relationship itself"):
        run_cypher(
            "MATCH (a)-[r:INHERITS]->(b) RETURN r", nodes, edges
        )


def test_simple_case_and_all_shortest_alias(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (c:CLASS) RETURN c.name AS n, "
        "CASE c.name WHEN 'Dog' THEN 'canine' WHEN 'Animal' THEN 'root' "
        "ELSE 'other' END AS tier ORDER BY n",
        nodes,
        edges,
    ).collect()
    tiers = {r["n"]: r["tier"] for r in out}
    assert tiers["Dog"] == "canine" and tiers["Animal"] == "root"
    assert all(v == "other" for k, v in tiers.items() if k not in ("Dog", "Animal"))
    # allShortestPaths alias compiles to the same min-dist projection
    a = run_cypher(
        "MATCH p = allShortestPaths((a:CLASS {name: 'Dog'})-[:INHERITS*1..3]->(b)) "
        "RETURN b.name AS base, length(p) AS d ORDER BY base",
        nodes,
        edges,
    ).collect()
    s = run_cypher(
        "MATCH p = shortestPath((a:CLASS {name: 'Dog'})-[:INHERITS*1..3]->(b)) "
        "RETURN b.name AS base, length(p) AS d ORDER BY base",
        nodes,
        edges,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in s] and a


def test_type_function_and_with_distinct(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (m:MODULE)-[r:CONTAINS]->(c) RETURN type(r) AS t, c.full_name "
        "ORDER BY c.full_name",
        nodes,
        edges,
    ).collect()
    assert out and all(r["t"] == "CONTAINS" for r in out)
    with pytest.raises(CypherError, match="relationship variable"):
        run_cypher("MATCH (c:CLASS) RETURN type(c)", nodes, edges)
    # WITH DISTINCT dedupes the projection
    rows = run_cypher(
        "MATCH (m:MODULE)-[:CONTAINS]->(c) WITH DISTINCT m.full_name AS mod "
        "RETURN mod ORDER BY mod",
        nodes,
        edges,
    ).collect()
    mods = [r["mod"] for r in rows]
    assert mods == sorted(set(mods)) and len(mods) >= 2


def test_union_dedups_and_union_all_keeps(spark, graph):
    nodes, edges = graph
    q = ("MATCH (c:CLASS) RETURN c.name AS nm "
         "UNION MATCH (c:CLASS) RETURN c.name AS nm")
    deduped = run_cypher(q, nodes, edges).collect()
    assert sorted(r.nm for r in deduped) == ["Animal", "Dog", "Puppy"]
    qall = ("MATCH (c:CLASS) RETURN c.name AS nm "
            "UNION ALL MATCH (c:CLASS) RETURN c.name AS nm")
    assert len(run_cypher(qall, nodes, edges).collect()) == 6


def test_union_refuses_mismatched_columns_and_mixing(spark, graph):
    nodes, edges = graph
    with pytest.raises(CypherError, match="same column names"):
        run_cypher(
            "MATCH (c:CLASS) RETURN c.name AS a "
            "UNION MATCH (m:MODULE) RETURN m.name AS b",
            nodes, edges,
        )
    with pytest.raises(CypherError, match="mixing UNION"):
        run_cypher(
            "MATCH (c:CLASS) RETURN c.name AS a "
            "UNION MATCH (m) RETURN m.name AS a "
            "UNION ALL MATCH (m) RETURN m.name AS a",
            nodes, edges,
        )


def test_union_as_identifier_is_not_a_split(spark, graph):
    """A variable legally named 'union' must not be parsed as the set
    operator (ADVICE r4 item 2): pattern position is bracket-depth>0,
    and RETURN-position uses are followed by '.', ',' or end — never by
    a clause keyword."""
    nodes, edges = graph
    rows = run_cypher(
        "MATCH (union:CLASS) RETURN union.name AS nm ORDER BY nm",
        nodes, edges,
    ).collect()
    assert [r.nm for r in rows] == ["Animal", "Dog", "Puppy"]
    # bare-variable return, 'union' as the last token of the query
    rows = run_cypher(
        "MATCH (union:CLASS {name: 'Dog'}) RETURN union", nodes, edges
    ).collect()
    assert len(rows) == 1 and rows[0]["union_full_name"] == "pkgb.dog.Dog"
    # ...and a real UNION between branches that also USE the identifier
    rows = run_cypher(
        "MATCH (union:CLASS) RETURN union.name AS nm "
        "UNION MATCH (union:MODULE) RETURN union.name AS nm",
        nodes, edges,
    ).collect()
    names = sorted(r.nm for r in rows)
    assert "Dog" in names and len(names) > 3


def test_union_keyword_inside_string_literal_is_not_a_split(spark, graph):
    nodes, edges = graph
    rows = run_cypher(
        "MATCH (c:CLASS) WHERE c.name <> 'UNION ALL' RETURN c.name AS nm",
        nodes, edges,
    ).collect()
    assert sorted(r.nm for r in rows) == ["Animal", "Dog", "Puppy"]


def test_call_db_procedures(graph):
    nodes, edges = graph
    labels = [
        r["label"]
        for r in run_cypher("CALL db.labels()", nodes, edges).collect()
    ]
    assert labels == sorted(labels)
    assert "CLASS" in labels and "v1" in labels
    # same universe labels(x) reports per node, globally deduped
    per_node = run_cypher(
        "MATCH (n) RETURN labels(n) AS ls", nodes, edges
    ).collect()
    universe = sorted({l for r in per_node for l in r["ls"]})
    assert labels == universe

    rts = run_cypher(
        "CALL db.relationshipTypes() YIELD relationshipType AS rt "
        "RETURN rt ORDER BY rt DESC LIMIT 2",
        nodes, edges,
    ).collect()
    all_types = sorted(
        {r["rel_type"] for r in edges.select("rel_type").distinct().collect()},
        reverse=True,
    )
    assert [r["rt"] for r in rts] == all_types[:2]

    keys = [
        r["propertyKey"]
        for r in run_cypher("CALL db.propertyKeys()", nodes, edges).collect()
    ]
    assert "full_name" in keys and "file_path" in keys
    # only keys some entity actually carries: the graph fixture's methods
    # have signatures, so the extractor-only columns appear
    assert "signature" in keys
    assert keys == sorted(keys)


def test_call_refusals(graph):
    nodes, edges = graph
    with pytest.raises(CypherError, match="unsupported CALL"):
        run_cypher("CALL my.proc()", nodes, edges)
    with pytest.raises(CypherError, match="unsupported CALL"):
        run_cypher("CALL { MATCH (n) RETURN n }", nodes, edges)
    with pytest.raises(CypherError, match="yields 'label'"):
        run_cypher("CALL db.labels() YIELD wrong", nodes, edges)
    with pytest.raises(CypherError, match="unbound variable"):
        run_cypher(
            "CALL db.labels() YIELD label AS l RETURN label", nodes, edges
        )
