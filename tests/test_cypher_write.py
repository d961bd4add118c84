"""Cypher write-clause subset (plans/cypher_write.py): MERGE / SET /
DELETE parity with the engine's B1–B5 mutation semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.datamodel import EDGES_SCHEMA, NODES_SCHEMA
from codegraphdb_spark.plans.cypher import CypherError
from codegraphdb_spark.plans.cypher_write import run_cypher_write


def _snapshot(spark):
    nodes = spark.createDataFrame(
        [
            ("m", "MODULE", "m", "m.py", None, None, None, 1, 9, ["v1"]),
            ("m.C", "CLASS", "C", "m.py", None, None, "m.py", 2, 8, ["v1"]),
            ("m.C.f", "METHOD", "f", "m.py", "m.C", "def f(self):", "m.py",
             3, 4, ["v1"]),
            ("ghost", "none", "ghost", None, None, None, None, None, None,
             ["v1"]),
        ],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            ("m", "m.C", "CONTAINS", "CLASS", ["v1"]),
            ("m.C", "m.C.f", "HAS_METHOD", None, ["v1"]),
            ("m.C.f", "ghost", "CALL", None, ["v1"]),
        ],
        EDGES_SCHEMA,
    )
    return nodes, edges


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_creates_node(spark):
    nodes, edges = _snapshot(spark)
    n2, e2 = run_cypher_write(
        "MERGE (n:FUNCTION {full_name: 'm.helper', file_path: 'm.py', "
        "code_start: 12})",
        nodes,
        edges,
        version="v2",
    )
    row = n2.filter(F.col("full_name") == "m.helper").collect()[0]
    assert row["kind"] == "FUNCTION"
    assert row["name"] == "helper"  # defaulted last segment
    assert row["file_path"] == "m.py"
    assert row["code_start"] == 12
    assert row["versions"] == ["v2"]
    # everything else untouched
    assert n2.count() == nodes.count() + 1
    assert _rows(e2) == _rows(edges)


def test_merge_updates_existing_preserving_unset_props(spark):
    nodes, edges = _snapshot(spark)
    n2, _ = run_cypher_write(
        "MERGE (n:CLASS {full_name: 'm.C', signature: 'class C(Base):'})",
        nodes,
        edges,
        version="v2",
    )
    row = n2.filter(F.col("full_name") == "m.C").collect()[0]
    assert row["signature"] == "class C(Base):"  # provided: overwritten
    assert row["file_path"] == "m.py"  # not provided: preserved
    assert row["code_start"] == 2
    assert sorted(row["versions"]) == ["v1", "v2"]  # union, not replace
    assert n2.count() == nodes.count()


def test_merge_promotes_placeholder_never_demotes(spark):
    nodes, edges = _snapshot(spark)
    n2, _ = run_cypher_write(
        "MERGE (n:FUNCTION {full_name: 'ghost'})", nodes, edges, version="v1"
    )
    assert n2.filter(F.col("full_name") == "ghost").collect()[0]["kind"] == (
        "FUNCTION"  # B3: explicit kind promotes 'none'
    )
    # a kind-less MERGE must not demote the promoted kind back to 'none'
    n3, _ = run_cypher_write(
        "MERGE (n {full_name: 'm.C'})", nodes, edges, version="v1"
    )
    assert n3.filter(F.col("full_name") == "m.C").collect()[0]["kind"] == "CLASS"


def test_merge_is_idempotent(spark):
    nodes, edges = _snapshot(spark)
    q = "MERGE (n:FUNCTION {full_name: 'm.helper', code_start: 12})"
    once_n, once_e = run_cypher_write(q, nodes, edges, version="v2")
    twice_n, twice_e = run_cypher_write(q, once_n, once_e, version="v2")
    assert _rows(once_n.withColumn("versions", F.to_json("versions"))) == _rows(
        twice_n.withColumn("versions", F.to_json("versions"))
    )
    assert _rows(once_e.withColumn("versions", F.to_json("versions"))) == _rows(
        twice_e.withColumn("versions", F.to_json("versions"))
    )


def test_merge_edge_synthesizes_missing_endpoint(spark):
    nodes, edges = _snapshot(spark)
    n2, e2 = run_cypher_write(
        "MERGE (a {full_name: 'm.C'})-[:INHERITS]->(b {full_name: 'ext.Base'})",
        nodes,
        edges,
        version="v2",
    )
    assert e2.filter(
        (F.col("src") == "m.C") & (F.col("dst") == "ext.Base")
        & (F.col("rel_type") == "INHERITS")
    ).count() == 1
    # B4: the unseen endpoint appears as a 'none' placeholder
    ph = n2.filter(F.col("full_name") == "ext.Base").collect()
    assert len(ph) == 1 and ph[0]["kind"] == "none" and ph[0]["name"] == "Base"


def test_merge_existing_edge_unions_versions(spark):
    nodes, edges = _snapshot(spark)
    _, e2 = run_cypher_write(
        "MERGE (a {full_name: 'm'})-[:CONTAINS {association_type: 'CLASS'}]->"
        "(b {full_name: 'm.C'})",
        nodes,
        edges,
        version="v2",
    )
    row = e2.filter((F.col("src") == "m") & (F.col("dst") == "m.C")).collect()
    assert len(row) == 1
    assert sorted(row[0]["versions"]) == ["v1", "v2"]
    assert e2.count() == edges.count()


def test_set_updates_matched_only(spark):
    nodes, edges = _snapshot(spark)
    n2, _ = run_cypher_write(
        "MATCH (n:METHOD {full_name: 'm.C.f'}) SET n.signature = 'def f(self, x):',"
        " n.code_end = 5",
        nodes,
        edges,
    )
    row = n2.filter(F.col("full_name") == "m.C.f").collect()[0]
    assert row["signature"] == "def f(self, x):"
    assert row["code_end"] == 5
    # non-matched rows byte-identical
    others = n2.filter(F.col("full_name") != "m.C.f")
    assert _rows(others.withColumn("versions", F.to_json("versions"))) == _rows(
        nodes.filter(F.col("full_name") != "m.C.f").withColumn(
            "versions", F.to_json("versions")
        )
    )
    # SET never creates
    n3, _ = run_cypher_write(
        "MATCH (n {full_name: 'nope'}) SET n.signature = 'x'", nodes, edges
    )
    assert n3.count() == nodes.count()


def test_detach_delete_cascades(spark):
    nodes, edges = _snapshot(spark)
    n2, e2 = run_cypher_write(
        "MATCH (n {full_name: 'ghost'}) DETACH DELETE n", nodes, edges
    )
    assert n2.filter(F.col("full_name") == "ghost").count() == 0
    assert e2.filter(F.col("dst") == "ghost").count() == 0
    assert e2.count() == edges.count() - 1


def test_plain_delete_refuses_referenced_node(spark):
    nodes, edges = _snapshot(spark)
    with pytest.raises(CypherError, match="DETACH"):
        run_cypher_write("MATCH (n {full_name: 'ghost'}) DELETE n", nodes, edges)
    # unreferenced node deletes fine
    n1, e1 = run_cypher_write(
        "MATCH (n {full_name: 'ghost'}) DETACH DELETE n", nodes, edges
    )
    n2, _ = run_cypher_write(
        "MERGE (x:FUNCTION {full_name: 'island'})", n1, e1
    )
    n3, _ = run_cypher_write("MATCH (n {full_name: 'island'}) DELETE n", n2, e1)
    assert n3.filter(F.col("full_name") == "island").count() == 0


def test_set_with_params_and_errors(spark):
    nodes, edges = _snapshot(spark)
    n2, _ = run_cypher_write(
        "MATCH (n {full_name: 'm.C'}) SET n.signature = $sig",
        nodes,
        edges,
        params={"sig": "class C(object):"},
    )
    assert (
        n2.filter(F.col("full_name") == "m.C").collect()[0]["signature"]
        == "class C(object):"
    )
    with pytest.raises(CypherError):
        run_cypher_write("MATCH (n {full_name: 'm.C'}) SET n.versions = 'x'",
                         nodes, edges)
    with pytest.raises(CypherError):
        run_cypher_write("MERGE (n {name: 'no-key'})", nodes, edges)
    with pytest.raises(CypherError):
        # FOREACH stays outside the write subset
        run_cypher_write("FOREACH (x IN [1] | SET n.p = 1)", nodes, edges)


def test_kind_property_refused(spark):
    nodes, edges = _snapshot(spark)
    with pytest.raises(CypherError, match="label"):
        run_cypher_write(
            "MERGE (n {full_name: 'x', kind: 'CLASS'})", nodes, edges
        )


def test_full_name_not_settable(spark):
    """Node identity is the merge key: SET n.full_name would orphan edges
    and collapse distinct nodes onto one key — refused loudly."""
    nodes, edges = _snapshot(spark)
    with pytest.raises(CypherError, match="identity"):
        run_cypher_write(
            "MATCH (n:METHOD) SET n.full_name = 'x'", nodes, edges
        )


def test_on_create_on_match_set(spark):
    """Neo4j MERGE clause semantics on the upsert base: ON CREATE SET
    applies only to a created row, ON MATCH SET only to a matched one
    (and beats the pattern prop there)."""
    nodes, edges = _snapshot(spark)
    q = (
        "MERGE (n:FUNCTION {full_name: 'm.job', signature: 'base'}) "
        "ON CREATE SET n.file_path = 'new.py', n.code_start = 1 "
        "ON MATCH SET n.signature = 'matched'"
    )
    n1, _ = run_cypher_write(q, nodes, edges, version="v1")
    created = n1.filter(F.col("full_name") == "m.job").collect()[0]
    assert created["signature"] == "base"  # pattern prop on create
    assert created["file_path"] == "new.py"  # ON CREATE applied
    assert created["code_start"] == 1
    n2, _ = run_cypher_write(q, n1, edges, version="v2")
    matched = n2.filter(F.col("full_name") == "m.job").collect()[0]
    assert matched["signature"] == "matched"  # ON MATCH beats pattern prop
    assert matched["file_path"] == "new.py"  # ON CREATE NOT re-applied...
    # ...and untouched rows stay untouched
    assert n2.filter(F.col("full_name") == "m.C").collect()[0]["kind"] == "CLASS"
    with pytest.raises(CypherError, match="node MERGE only"):
        run_cypher_write(
            "MERGE (a {full_name: 'm'})-[:CONTAINS]->(b {full_name: 'm.C'}) "
            "ON CREATE SET a.file_path = 'x'",
            nodes,
            edges,
        )


def test_merge_pattern_with_parens_in_quoted_value(spark):
    """Quoted property values containing parens must not derail the
    pattern/clause split."""
    nodes, edges = _snapshot(spark)
    n1, _ = run_cypher_write(
        "MERGE (n:FUNCTION {full_name: 'm.g', signature: 'def g(x):'}) "
        "ON CREATE SET n.code_start = 7",
        nodes,
        edges,
    )
    row = n1.filter(F.col("full_name") == "m.g").collect()[0]
    assert row["signature"] == "def g(x):"
    assert row["code_start"] == 7


def test_create_node_strict_insert(spark):
    nodes, edges = _snapshot(spark)
    n2, e2 = run_cypher_write(
        "CREATE (n:FUNCTION {full_name: 'm.fresh', file_path: 'm.py'})",
        nodes,
        edges,
        version="v2",
    )
    row = n2.filter(F.col("full_name") == "m.fresh").collect()[0]
    assert row["kind"] == "FUNCTION"
    assert row["name"] == "fresh"
    assert row["versions"] == ["v2"]
    assert n2.count() == nodes.count() + 1
    assert _rows(e2) == _rows(edges)


def test_create_refuses_duplicate_node_identity(spark):
    nodes, edges = _snapshot(spark)
    with pytest.raises(CypherError, match="duplicate node identity"):
        run_cypher_write(
            "CREATE (n:CLASS {full_name: 'm.C'})", nodes, edges, version="v2"
        )


def test_create_edge_synthesizes_endpoint_and_refuses_duplicate(spark):
    nodes, edges = _snapshot(spark)
    n2, e2 = run_cypher_write(
        "CREATE (a {full_name: 'm.C.f'})-[:CALL]->(b {full_name: 'ext.fn'})",
        nodes,
        edges,
        version="v2",
    )
    assert e2.filter(
        (F.col("src") == "m.C.f") & (F.col("dst") == "ext.fn")
        & (F.col("rel_type") == "CALL")
    ).count() == 1
    # B4 placeholder synthesis for the unknown endpoint
    ghost = n2.filter(F.col("full_name") == "ext.fn").collect()[0]
    assert ghost["kind"] == "none"
    with pytest.raises(CypherError, match="duplicate edge"):
        run_cypher_write(
            "CREATE (a {full_name: 'm.C'})-[:CONTAINS]->(b {full_name: 'm.C.f'})"
            .replace("CONTAINS", "HAS_METHOD"),
            nodes,
            edges,
            version="v2",
        )


def test_create_requires_full_name(spark):
    nodes, edges = _snapshot(spark)
    with pytest.raises(CypherError, match="full_name"):
        run_cypher_write("CREATE (n:CLASS {name: 'X'})", nodes, edges)



def test_remove_nulls_matched_property_only(spark):
    nodes, edges = _snapshot(spark)
    n2, e2 = run_cypher_write(
        "MATCH (n:METHOD {full_name: 'm.C.f'}) REMOVE n.signature",
        nodes,
        edges,
    )
    assert (
        n2.filter(F.col("full_name") == "m.C.f").collect()[0]["signature"] is None
    )
    # untouched node keeps its property; edges untouched
    assert (
        n2.filter(F.col("full_name") == "m.C").collect()[0]["file_path"] == "m.py"
    )
    assert _rows(e2) == _rows(edges)
    with pytest.raises(CypherError, match="not a removable"):
        run_cypher_write("MATCH (n {full_name: 'm.C'}) REMOVE n.versions",
                         nodes, edges)
    with pytest.raises(CypherError, match="not a removable"):
        run_cypher_write("MATCH (n {full_name: 'm.C'}) REMOVE n.full_name",
                         nodes, edges)


def test_ignored_labels_refused(spark):
    nodes, edges = _snapshot(spark)
    with pytest.raises(CypherError, match="version label"):
        run_cypher_write("CREATE (n:CLASS:v9 {full_name: 'x'})", nodes, edges)
    with pytest.raises(CypherError, match="version label"):
        run_cypher_write("MERGE (n:FUNCTION:v9 {full_name: 'x'})", nodes, edges)
    with pytest.raises(CypherError, match="edge endpoint"):
        run_cypher_write(
            "MERGE (a:CLASS {full_name: 'm.C'})-[:INHERITS]->(b {full_name: 'y'})",
            nodes,
            edges,
        )


# ---------------------------------------------------------------- FOREACH


def _join_count(df) -> int:
    return df._jdf.queryExecution().optimizedPlan().toString().count("Join ")


def test_foreach_merge_nodes_batches_to_one_join(spark):
    nodes, edges = _snapshot(spark)
    n2, e2 = run_cypher_write(
        "FOREACH (fn IN ['m.a', 'm.b', 'm.C'] | "
        "MERGE (n:FUNCTION {full_name: fn, file_path: 'm.py'}))",
        nodes,
        edges,
        version="v2",
    )
    got = {r["full_name"]: r for r in n2.collect()}
    # two created, one matched (m.C: kind CLASS is authoritative-overwritten
    # by the statement's FUNCTION label, versions unioned)
    assert got["m.a"]["kind"] == "FUNCTION" and got["m.a"]["versions"] == ["v2"]
    assert got["m.b"]["name"] == "b"
    assert got["m.C"]["versions"] == ["v1", "v2"]
    assert got["m.C"]["file_path"] == "m.py"
    assert n2.count() == nodes.count() + 2
    assert _rows(e2) == _rows(edges)
    # the batch is ONE set-oriented upsert: exactly one join in the plan,
    # not one per element
    assert _join_count(n2) == 1


def test_foreach_merge_on_clauses_apply_per_branch(spark):
    nodes, edges = _snapshot(spark)
    n2, _ = run_cypher_write(
        "FOREACH (fn IN ['m.new', 'm.C'] | "
        "MERGE (n:CLASS {full_name: fn}) "
        "ON CREATE SET n.code_start = 1 ON MATCH SET n.code_start = 77)",
        nodes,
        edges,
        version="v2",
    )
    got = {r["full_name"]: r for r in n2.collect()}
    assert got["m.new"]["code_start"] == 1   # created branch
    assert got["m.C"]["code_start"] == 77    # matched branch
    assert _join_count(n2) == 1


def test_foreach_merge_edges_batches(spark):
    nodes, edges = _snapshot(spark)
    n2, e2 = run_cypher_write(
        "FOREACH (dst IN ['m.C', 'ext.Dep'] | "
        "MERGE (a {full_name: 'm.C.f'})-[:CALL {association_type: 'call'}]"
        "->(b {full_name: dst}))",
        nodes,
        edges,
        version="v2",
    )
    e = {(r["src"], r["dst"], r["rel_type"]): r for r in e2.collect()}
    assert e[("m.C.f", "m.C", "CALL")]["versions"] == ["v2"]
    assert e[("m.C.f", "ext.Dep", "CALL")]["association_type"] == "call"
    # missing endpoint synthesized as a 'none' placeholder (B4)
    ph = n2.filter(F.col("full_name") == "ext.Dep").collect()
    assert len(ph) == 1 and ph[0]["kind"] == "none"
    assert _join_count(e2) == 1


def test_foreach_duplicate_keys_refuse(spark):
    nodes, edges = _snapshot(spark)
    with pytest.raises(CypherError, match="duplicate node identity"):
        run_cypher_write(
            "FOREACH (fn IN ['m.a', 'm.a'] | MERGE (n {full_name: fn}))",
            nodes,
            edges,
        )
    with pytest.raises(CypherError, match="duplicate"):
        run_cypher_write(
            "FOREACH (d IN ['m.C', 'm.C'] | "
            "MERGE (a {full_name: 'm'})-[:CONTAINS]->(b {full_name: d}))",
            nodes,
            edges,
        )


def test_foreach_sequential_set_body(spark):
    nodes, edges = _snapshot(spark)
    n2, _ = run_cypher_write(
        "FOREACH (fn IN ['m.C', 'm.C.f'] | "
        "MATCH (n {full_name: fn}) SET n.code_end = 99)",
        nodes,
        edges,
    )
    got = {r["full_name"]: r["code_end"] for r in n2.collect()}
    assert got["m.C"] == 99 and got["m.C.f"] == 99
    assert got["m"] == 9  # untouched


def test_foreach_param_list_and_int_substitution(spark):
    nodes, edges = _snapshot(spark)
    n2, _ = run_cypher_write(
        "FOREACH (cs IN $starts | "
        "MATCH (n {full_name: 'm.C'}) SET n.code_start = cs)",
        nodes,
        edges,
        params={"starts": [41, 42]},
    )
    got = n2.filter(F.col("full_name") == "m.C").collect()[0]
    assert got["code_start"] == 42  # sequential: last element wins


def test_foreach_map_key_is_not_the_loop_variable(spark):
    nodes, edges = _snapshot(spark)
    # loop var 'name' collides with the property KEY 'name': only the
    # VALUE position substitutes
    n2, _ = run_cypher_write(
        "FOREACH (name IN ['m.x'] | "
        "MERGE (n:FUNCTION {full_name: name, name: 'fixed'}))",
        nodes,
        edges,
        version="v2",
    )
    row = n2.filter(F.col("full_name") == "m.x").collect()[0]
    assert row["name"] == "fixed"


def test_foreach_map_value_without_space_substitutes(spark):
    """ADVICE r5: '{full_name:x}' — a map VALUE written without a space
    after the colon — is a value use of the loop variable (the colon is
    the key separator inside braces, not a label marker) and must
    substitute; '(n:x)' at brace depth 0 stays a label."""
    nodes, edges = _snapshot(spark)
    n2, _ = run_cypher_write(
        "FOREACH (x IN ['m.y1', 'm.y2'] | MERGE (n:FUNCTION {full_name:x}))",
        nodes,
        edges,
        version="v2",
    )
    got = sorted(
        r["full_name"]
        for r in n2.filter(F.col("full_name").isin("m.y1", "m.y2")).collect()
    )
    assert got == ["m.y1", "m.y2"]


def test_foreach_label_named_like_loop_variable_still_refuses(spark):
    """The label position must NOT be treated as a value use even after
    the colon rule relaxation: a body whose only 'x' is the label (n:x)
    still raises the never-uses-the-loop-variable refusal."""
    nodes, edges = _snapshot(spark)
    with pytest.raises(Exception, match="never uses the loop variable"):
        run_cypher_write(
            "FOREACH (x IN ['FUNCTION'] | MERGE (n:x {full_name: 'm.z'}))",
            nodes,
            edges,
            version="v2",
        )


def test_foreach_refusals(spark):
    nodes, edges = _snapshot(spark)
    with pytest.raises(CypherError, match="nested FOREACH"):
        run_cypher_write(
            "FOREACH (x IN ['a'] | FOREACH (y IN ['b'] | "
            "MERGE (n {full_name: y})))",
            nodes,
            edges,
        )
    with pytest.raises(CypherError, match="never uses the loop variable"):
        run_cypher_write(
            "FOREACH (x IN ['a', 'b'] | MERGE (n {full_name: 'fixed'}))",
            nodes,
            edges,
        )
    with pytest.raises(CypherError, match="needs a list"):
        run_cypher_write(
            "FOREACH (x IN $p | MERGE (n {full_name: x}))",
            nodes,
            edges,
            params={"p": "not-a-list"},
        )
    with pytest.raises(CypherError, match="quote"):
        run_cypher_write(
            "FOREACH (x IN $p | MERGE (n {full_name: x}))",
            nodes,
            edges,
            params={"p": ["it's"]},
        )
    big = "[" + ", ".join(str(i) for i in range(101)) + "]"
    with pytest.raises(CypherError, match="non-batchable body caps"):
        run_cypher_write(
            f"FOREACH (x IN {big} | MATCH (n {{full_name: 'm'}}) "
            "SET n.code_start = x)",
            nodes,
            edges,
        )
    # empty list: no-op, same frames
    n2, e2 = run_cypher_write(
        "FOREACH (x IN [] | MERGE (n {full_name: x}))", nodes, edges
    )
    assert _rows(n2) == _rows(nodes) and _rows(e2) == _rows(edges)


def test_foreach_batch_scales_to_cap(spark):
    """The batched-MERGE claim at the cap: a 1000-element FOREACH still
    compiles to ONE join (constant plan depth — the reason the batch cap
    is 10× the sequential cap) and upserts every key."""
    nodes, edges = _snapshot(spark)
    elems = ", ".join(f"'m.f{i:04d}'" for i in range(1000))
    n2, _ = run_cypher_write(
        f"FOREACH (fn IN [{elems}] | MERGE (n:FUNCTION {{full_name: fn}}))",
        nodes,
        edges,
        version="v2",
    )
    assert _join_count(n2) == 1
    assert n2.filter(F.col("kind") == "FUNCTION").count() == 1000
    assert n2.count() == nodes.count() + 1000


def test_foreach_batch_equals_sequential_reference(spark):
    """Property pin (fixed corpus of generated cases, no Spark-per-example
    hypothesis cost): for ANY same-template list — new keys, existing
    keys, keys colliding with the loop variable's name, int property
    values — the BATCHED FOREACH result equals applying the MERGE
    element-by-element through run_cypher_write (the sequential reference
    semantics openCypher defines). Cases are distinct-keyed because
    duplicate keys refuse by contract (tested above)."""
    import random

    rng = random.Random(5)
    nodes0, edges0 = _snapshot(spark)
    for case in range(4):
        n_elems = rng.choice([1, 2, 5])
        keys = rng.sample(
            ["m.C", "m.C.f", "ghost", "m.aa", "m.bb", "pkg.x", "fn", "n"],
            n_elems,
        )
        var = rng.choice(["x", "fn", "n"])  # may collide with a key string
        cs = rng.randint(1, 99)
        template = (
            f"MERGE (nn:FUNCTION {{full_name: {var!r}, code_start: {cs}}})"
        )
        elems = ", ".join(f"'{k}'" for k in keys)
        batched, _ = run_cypher_write(
            f"FOREACH ({var} IN [{elems}] | "
            + template.replace(repr(var), var)
            + ")",
            nodes0,
            edges0,
            version="v9",
        )
        seq = nodes0
        for k in keys:
            seq, _ = run_cypher_write(
                template.replace(repr(var), f"'{k}'"), seq, edges0, version="v9"
            )
        assert batched.exceptAll(seq).count() == 0, (case, keys, var)
        assert seq.exceptAll(batched).count() == 0, (case, keys, var)


def test_foreach_backticked_label_is_not_the_loop_variable(spark):
    """A backticked label whose TEXT equals the loop variable must not be
    substituted — it's a label token, not a value use. The version-label
    refusal fires on the label itself (the engine's normal contract), not
    on a corrupted substitution."""
    nodes, edges = _snapshot(spark)
    with pytest.raises(CypherError, match="version label"):
        run_cypher_write(
            "FOREACH (x IN ['m.a'] | MERGE (n:`x` {full_name: x}))",
            nodes,
            edges,
        )
