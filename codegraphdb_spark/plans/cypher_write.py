"""Cypher WRITE-clause subset: MERGE / SET / DELETE compiled to the same
set-oriented mutation semantics the engine's B1–B5 operators implement
(operators/merge.py) — closing the write half of the reference's Cypher
surface (graphDB.py:121-174: add_node/add_edge/update/delete issued as
Cypher by the reference's client) without per-record read-modify-write.

Supported statements (one write clause per call):

    MERGE (n:KIND {full_name: '...', prop: val, ...})
          [ON CREATE SET n.p = v ...] [ON MATCH SET n.q = w ...]
        node upsert keyed on full_name (B1): provided properties
        overwrite, absent ones are preserved, the write version joins the
        versions array; a 'none' placeholder is promoted to the MERGE's
        kind but an explicit existing kind is never demoted (B3).
        ON CREATE SET applies only to the created row; ON MATCH SET only
        to the matched one, where it beats the pattern property.
    MERGE (a {full_name: '..'})-[:REL {association_type: '..'}]->(b {full_name: '..'})
        edge upsert keyed on (src, dst, rel_type) (B4 dedupe part);
        missing endpoints are synthesized as 'none' placeholders exactly
        like the engine does (B4, graphDB.py:133-153 parity).
    CREATE (n:KIND {full_name: '...', prop: val, ...})
    CREATE (a {full_name: '..'})-[:REL {props}]->(b {full_name: '..'})
        strict insert. openCypher CREATE always makes a fresh node, but
        this engine's node identity IS full_name (SURVEY §1.2) — a second
        node with the same key is unrepresentable — so CREATE refuses
        (CypherError) when the node key or the (src, dst, rel_type) edge
        key already exists, and otherwise behaves exactly like the MERGE
        create branch (edge endpoints are synthesized as 'none'
        placeholders per B4). Use MERGE for upsert semantics.
    MATCH (n:KIND {props}) SET n.prop = val [, n.prop2 = val2]
        property update on matched nodes only — never creates (B2).
    MATCH (n:KIND {props}) REMOVE n.prop [, n.prop2]
        null out properties on matched nodes (full_name/kind/versions
        are structural and refuse).
    MATCH (n:KIND {props}) DETACH DELETE n
        delete matched nodes and cascade every edge touching them
        (B5-style DETACH semantics).
    MATCH (n:KIND {props}) DELETE n
        like Neo4j, refuses (CypherError) if any edge still references a
        matched node.
    FOREACH (x IN [elems] | <write clause using x>)   (also x IN $param)
        openCypher's bulk write iterator over a parse-time list (literal
        or $param — the same driver-side contract UNWIND's parameter
        lists have). Same-template MERGE bodies — identical kind/rel,
        property keys, ON clauses; only the substituted values differ —
        compile to ONE batched upsert join regardless of list length
        (duplicate keys refuse loudly: batched last-wins can't reproduce
        sequential ON CREATE→ON MATCH). Other bodies run sequentially,
        capped at MAX_FOREACH_SEQ because each element stacks a plan.

Values in property maps / SET may be 'str', "str", int, or $param
(the same strict parser as the read front end — unparseable entries
raise, plans/cypher.py::_parse_props).

Returns NEW (nodes, edges) DataFrames; nothing is persisted — callers
write through engine.write_snapshot, which stays the single durability
point (atomic staged-commit swap).

Scale shape: the write set is a parsed literal — a handful of rows
broadcast against the snapshot. The only wide operation is one
full_name-keyed outer join with the tiny side explicitly broadcast; no
locks, no driver loops, and re-running the same statement yields the
identical snapshot (idempotent like every engine mutation).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codegraphdb_spark.datamodel import EDGES_SCHEMA, NODES_SCHEMA
from codegraphdb_spark.plans.cypher import (
    _NODE,
    _PARAMS,
    CypherError,
    _literal,
    _node_filter,
    _parse_labels,
    _parse_props,
    _string_spans,
)


def _split_assignments(s: str) -> list[str]:
    """Split SET assignments on commas OUTSIDE string literals (a naive
    split breaks 'def f(self, x):')."""
    spans = _string_spans(s)
    parts: list[str] = []
    last = 0
    for i, ch in enumerate(s):
        if ch == "," and not any(a <= i < b for a, b in spans):
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return parts

_CREATE_RX = re.compile(r"(?is)^\s*CREATE\s+(?P<pattern>\(.*)\s*$")

_NODE_COLS = [f.name for f in NODES_SCHEMA.fields]
_PROP_COLS = [c for c in _NODE_COLS if c not in ("full_name", "kind", "versions")]
_INT_PROPS = {"code_start", "code_end"}

# the node-pattern matcher tolerates parens INSIDE quoted values
# ('def f(x):') by consuming quoted strings atomically
_MERGE_RX = re.compile(
    r"(?is)^\s*MERGE\s+"
    r"(?P<pattern>\((?:[^()'\"]|'[^']*'|\"[^\"]*\")*\))"
    r"(?P<clauses>(?:\s+ON\s+(?:CREATE|MATCH)\s+SET\s+.*?)*)\s*$"
)
_ON_CLAUSE_RX = re.compile(
    r"(?is)\s+ON\s+(?P<kind>CREATE|MATCH)\s+SET\s+"
    r"(?P<assigns>.*?)(?=\s+ON\s+(?:CREATE|MATCH)\s+SET\s+|$)"
)
_SET_RX = re.compile(
    r"(?is)^\s*MATCH\s+(?P<pattern>\(.*?\))\s+SET\s+(?P<assigns>.+?)\s*$"
)
_REMOVE_RX = re.compile(
    r"(?is)^\s*MATCH\s+(?P<pattern>\(.*?\))\s+REMOVE\s+(?P<items>.+?)\s*$"
)
_DELETE_RX = re.compile(
    r"(?is)^\s*MATCH\s+(?P<pattern>\(.*?\))\s+(?P<detach>DETACH\s+)?DELETE\s+"
    r"(?P<var>\w+)\s*$"
)
_ASSIGN_RX = re.compile(
    r"^\s*(?P<var>\w+)\.(?P<prop>\w+)\s*=\s*"
    r"(?:'(?P<sq>[^']*)'|\"(?P<dq>[^\"]*)\"|(?P<num>\d+)|\$(?P<param>\w+))\s*$"
)
_EDGE_MERGE_RX = re.compile(
    r"(?is)^\s*(?P<a>\([^)]*\))\s*-\s*\[\s*:(?P<rel>\w+)\s*"
    r"(?:\{(?P<props>[^}]*)\})?\s*\]\s*->\s*(?P<b>\([^)]*\))\s*$"
)


def _parse_assignments(assigns: str, var: str) -> dict[str, object]:
    """SET-style assignment list `v.prop = value, ...` → {prop: typed val}
    (shared by MATCH…SET and MERGE's ON CREATE/ON MATCH SET)."""
    updates: dict[str, object] = {}
    for part in _split_assignments(assigns):
        m = _ASSIGN_RX.fullmatch(part)
        if not m:
            raise CypherError(f"cannot parse SET assignment {part.strip()!r}")
        if m.group("var") != var:
            raise CypherError(
                f"SET variable {m.group('var')!r} is not the matched {var!r}"
            )
        if m.group("param") is not None:
            from codegraphdb_spark.plans.cypher import _param_value

            val = _param_value(m.group("param"))
        elif m.group("num") is not None:
            val = int(m.group("num"))
        else:
            val = m.group("sq") if m.group("sq") is not None else m.group("dq")
        updates[m.group("prop")] = _typed_prop(m.group("prop"), val)
    return updates


def _refuse_ignored_labels(
    kind: str | None, versions: list[str], where: str, allow_kind: bool
) -> None:
    """Write patterns stamp versions from the ``version`` argument and (for
    edge endpoints) never apply kinds — a label the statement would
    silently ignore is refused instead (the refuse-loudly policy)."""
    if versions:
        raise CypherError(
            f"{where}: version label(s) {versions!r} are not applied by "
            "write statements — pass version= to run_cypher_write instead"
        )
    if kind is not None and not allow_kind:
        raise CypherError(
            f"{where}: a kind label on an edge endpoint is not applied — "
            "MERGE/CREATE the node itself to set its kind"
        )


def _parse_single_node(pattern: str) -> tuple[str | None, list[str], dict]:
    m = _NODE.fullmatch(pattern.strip())
    if not m:
        raise CypherError(f"cannot parse node pattern {pattern!r}")
    kind, versions = _parse_labels(m.group("labels") or "")
    props = _parse_props(m.group("props"))
    return kind, versions, props


def _require_key(props: dict, where: str) -> str:
    fn = props.get("full_name")
    if not isinstance(fn, str) or not fn:
        raise CypherError(f"{where} requires a string full_name property")
    return fn


def _typed_prop(prop: str, val: object) -> object:
    if prop == "kind":
        raise CypherError("set kind via a label (MERGE (n:CLASS ...)), not a property")
    if prop == "full_name":
        # node identity is the merge key, never a writable property —
        # rewriting it would orphan edges and collapse distinct nodes
        # onto one key (rename = DETACH DELETE + MERGE, explicitly)
        raise CypherError("full_name is the node identity and cannot be SET")
    if prop not in _NODE_COLS or prop in ("versions",):
        raise CypherError(f"unknown writable property {prop!r}")
    if prop in _INT_PROPS:
        if not isinstance(val, int):
            raise CypherError(f"{prop} must be an int (got {val!r})")
        return val
    if not isinstance(val, (str, int)):
        raise CypherError(f"{prop} must be str or int (got {type(val).__name__})")
    return str(val)


def _merge_node(
    nodes: DataFrame,
    kind: str | None,
    props: dict | list[dict],
    version: str,
    on_create: dict | None = None,
    on_match: dict | None = None,
) -> DataFrame:
    # A list of property maps is a BATCH upsert (FOREACH compiles to it):
    # same template — same kind, same provided-property KEYS, same ON
    # clauses — with per-row values. One full_outer join for the whole
    # batch instead of N sequential passes over the node table; duplicate
    # keys are refused because batched last-wins cannot reproduce
    # sequential ON CREATE-then-ON MATCH semantics.
    props_list = props if isinstance(props, list) else [props]
    keys = [_require_key(p, "MERGE (node)") for p in props_list]
    if len(set(keys)) != len(keys):
        dup = next(k for k in keys if keys.count(k) > 1)
        raise CypherError(
            f"batched MERGE has duplicate node identity {dup!r} — "
            "sequential re-merge of one key is not batchable"
        )
    provided_keys = {p for pr in props_list for p in pr if p != "full_name"}
    spark = nodes.sparkSession
    rows = []
    for full_name, pr in zip(keys, props_list):
        provided = {
            p: _typed_prop(p, v) for p, v in pr.items() if p != "full_name"
        }
        row = {c: None for c in _NODE_COLS}
        row.update(provided)
        row["full_name"] = full_name
        row["kind"] = kind or "none"
        # default name: last dotted segment, like B4's placeholder synthesis
        if row.get("name") is None:
            row["name"] = full_name.rsplit(".", 1)[-1]
        row["versions"] = [version]
        rows.append(tuple(row[c] for c in _NODE_COLS))
    provided = dict.fromkeys(provided_keys, True)
    # pandas input → JVM LocalTableScan (closure.py precedent): the
    # plain-list form plans a pickled-Python-RDD scan that re-runs a
    # Python worker on every downstream action over the merged frame —
    # three chained MERGEs made g_cypher_write_roundtrip pay it 3x
    import pandas as pd

    new = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame(rows, columns=_NODE_COLS), NODES_SCHEMA
        ).select([F.col(c).alias(f"n__{c}") for c in _NODE_COLS])
    )
    joined = nodes.join(new, nodes.full_name == new.n__full_name, "full_outer")
    out = [F.coalesce("full_name", "n__full_name").alias("full_name")]
    # B3 label promotion: an explicit MERGE kind overwrites 'none' (and any
    # prior kind — the statement is authoritative); a kind-less MERGE never
    # demotes an existing explicit kind
    out.append(
        F.when(
            F.col("n__kind").isNotNull() & (F.col("n__kind") != "none"),
            F.col("n__kind"),
        )
        .otherwise(F.coalesce("kind", "n__kind"))
        .alias("kind")
    )
    on_create = on_create or {}
    on_match = on_match or {}
    is_created = F.col("full_name").isNull() & F.col("n__full_name").isNotNull()
    is_matched = F.col("full_name").isNotNull() & F.col("n__full_name").isNotNull()
    types = {f.name: f.dataType for f in NODES_SCHEMA.fields}
    for c in _PROP_COLS:
        if c in provided:
            # provided: the statement's value wins on the matched row
            expr = F.when(
                F.col("n__full_name").isNotNull(), F.col(f"n__{c}")
            ).otherwise(F.col(c))
        else:
            # not provided: existing value preserved; on create the new
            # row supplies only the defaulted name (others stay NULL)
            expr = F.coalesce(c, f"n__{c}")
        # branch-conditional overrides: ON MATCH SET beats the pattern
        # prop on the matched row; ON CREATE SET applies to the created
        # row only (Neo4j MERGE clause semantics on the upsert base)
        if c in on_match:
            expr = F.when(
                is_matched, F.lit(on_match[c]).cast(types[c])
            ).otherwise(expr)
        if c in on_create:
            expr = F.when(
                is_created, F.lit(on_create[c]).cast(types[c])
            ).otherwise(expr)
        out.append(expr.alias(c))
    out.append(
        F.when(
            F.col("versions").isNotNull() & F.col("n__versions").isNotNull(),
            F.array_union("versions", "n__versions"),
        )
        .otherwise(F.coalesce("versions", "n__versions"))
        .alias("versions")
    )
    return joined.select(*[c for c in out])


def _merge_edge(
    nodes: DataFrame,
    edges: DataFrame,
    items: list[tuple[dict, dict, dict]],
    rel: str,
    version: str,
) -> tuple[DataFrame, DataFrame]:
    """Upsert one edge — or a BATCH of same-template edges (FOREACH): one
    full_outer join keyed on (src, dst, rel_type) regardless of batch
    size. ``items`` holds (a_props, e_props, b_props) per edge; the
    association-provided flag must be uniform across the batch (same
    template) because the overwrite-vs-preserve branch is compiled once."""
    rows = []
    has_assoc = "association_type" in items[0][1]
    for a_props, e_props, b_props in items:
        src = _require_key(a_props, "MERGE (edge) left endpoint")
        dst = _require_key(b_props, "MERGE (edge) right endpoint")
        assoc = e_props.get("association_type")
        if assoc is not None and not isinstance(assoc, str):
            raise CypherError("association_type must be a string")
        unknown = set(e_props) - {"association_type"}
        if unknown:
            raise CypherError(f"unsupported edge properties: {sorted(unknown)}")
        if ("association_type" in e_props) != has_assoc:
            raise CypherError(
                "batched edge MERGE mixes with- and without-association "
                "templates"
            )
        rows.append((src, dst, rel, assoc, [version]))
    if len({r[:3] for r in rows}) != len(rows):
        raise CypherError(
            "batched edge MERGE has duplicate (src, dst, rel_type) keys"
        )
    spark = edges.sparkSession
    # pandas input → JVM LocalTableScan, same rationale as the node batch
    import pandas as pd

    new = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame(rows, columns=[f.name for f in EDGES_SCHEMA.fields]),
            EDGES_SCHEMA,
        ).select([F.col(c).alias(f"e__{c}") for c in edges.columns])
    )
    key = (
        (edges.src == new.e__src)
        & (edges.dst == new.e__dst)
        & (edges.rel_type == new.e__rel_type)
    )
    joined = edges.join(new, key, "full_outer")
    merged = joined.select(
        F.coalesce("src", "e__src").alias("src"),
        F.coalesce("dst", "e__dst").alias("dst"),
        F.coalesce("rel_type", "e__rel_type").alias("rel_type"),
        # provided association overwrites; absent keeps old (template-level
        # flag: uniform across a batch, asserted above)
        (
            F.when(F.col("e__src").isNotNull() & F.lit(has_assoc),
                   F.col("e__association_type"))
            .otherwise(F.coalesce("association_type", "e__association_type"))
        ).alias("association_type"),
        F.when(
            F.col("versions").isNotNull() & F.col("e__versions").isNotNull(),
            F.array_union("versions", "e__versions"),
        )
        .otherwise(F.coalesce("versions", "e__versions"))
        .alias("versions"),
    )
    from codegraphdb_spark.operators.merge import synthesize_endpoints

    return synthesize_endpoints(nodes, merged, version), merged


def _set_props(
    nodes: DataFrame,
    kind: str | None,
    versions: list[str],
    props: dict,
    var: str,
    assigns: str,
) -> DataFrame:
    updates = _parse_assignments(assigns, var)
    matched = F.broadcast(
        _node_filter(nodes, kind, versions, props)
        .select("full_name")
        .withColumn("__hit", F.lit(True))
    )
    df = nodes.join(matched, "full_name", "left")
    for prop, val in updates.items():
        df = df.withColumn(
            prop,
            F.when(F.col("__hit"), F.lit(val).cast(dict(
                (f.name, f.dataType) for f in NODES_SCHEMA.fields
            )[prop])).otherwise(F.col(prop)),
        )
    return df.drop("__hit").select(*_NODE_COLS)


def _remove_props(
    nodes: DataFrame,
    kind: str | None,
    versions: list[str],
    props: dict,
    var: str,
    items: str,
) -> DataFrame:
    """REMOVE n.prop — null out properties on matched nodes (openCypher
    REMOVE; the identity/kind/versions columns are structural, not
    removable properties, and refuse like SET does)."""
    targets: list[str] = []
    for part in _split_assignments(items):
        m = re.fullmatch(r"\s*(?P<var>\w+)\.(?P<prop>\w+)\s*", part)
        if not m:
            raise CypherError(f"cannot parse REMOVE item {part.strip()!r}")
        if m.group("var") != var:
            raise CypherError(
                f"REMOVE variable {m.group('var')!r} is not the matched {var!r}"
            )
        prop = m.group("prop")
        if prop in ("full_name", "kind", "versions") or prop not in _NODE_COLS:
            raise CypherError(f"{prop!r} is not a removable property")
        targets.append(prop)
    matched = F.broadcast(
        _node_filter(nodes, kind, versions, props)
        .select("full_name")
        .withColumn("__hit", F.lit(True))
    )
    types = {f.name: f.dataType for f in NODES_SCHEMA.fields}
    df = nodes.join(matched, "full_name", "left")
    for prop in targets:
        df = df.withColumn(
            prop,
            F.when(F.col("__hit"), F.lit(None).cast(types[prop])).otherwise(
                F.col(prop)
            ),
        )
    return df.drop("__hit").select(*_NODE_COLS)


def _delete(
    nodes: DataFrame,
    edges: DataFrame,
    kind: str | None,
    versions: list[str],
    props: dict,
    detach: bool,
) -> tuple[DataFrame, DataFrame]:
    matched = _node_filter(nodes, kind, versions, props).select("full_name")
    if not detach:
        still_referenced = (
            edges.join(
                F.broadcast(matched.withColumnRenamed("full_name", "src")),
                "src",
                "left_semi",
            )
            .limit(1)
            .unionByName(
                edges.join(
                    F.broadcast(matched.withColumnRenamed("full_name", "dst")),
                    "dst",
                    "left_semi",
                ).limit(1)
            )
            .limit(1)
            .count()
        )
        if still_referenced:
            raise CypherError(
                "DELETE would orphan relationships — use DETACH DELETE"
            )
    b = F.broadcast(matched)
    n = nodes.join(b, "full_name", "left_anti")
    e = (
        edges.join(b.withColumnRenamed("full_name", "src"), "src", "left_anti")
        .join(b.withColumnRenamed("full_name", "dst"), "dst", "left_anti")
    )
    return n, e


def _parse_merge_stmt(query: str):
    """Classify + parse a MERGE statement. Returns None when the text is
    not a MERGE, ('edge', a_props, rel, e_props, b_props) for an edge
    upsert, or ('node', kind, props, on_create, on_match) for a node
    upsert. Shared by run_cypher_write and the FOREACH batcher."""
    m = _MERGE_RX.fullmatch(query)
    if m is None:
        # edge MERGE patterns contain ')' mid-pattern — retry greedily
        m = re.fullmatch(r"(?is)^\s*MERGE\s+(?P<pattern>\(.*)\s*$", query)
        if m and re.search(r"(?i)\bON\s+(CREATE|MATCH)\s+SET\b", query):
            raise CypherError(
                "ON CREATE/ON MATCH SET is supported on node MERGE only"
            )
    if m is None:
        return None
    pattern = m.group("pattern").strip()
    clauses = m.groupdict().get("clauses") or ""
    em = _EDGE_MERGE_RX.fullmatch(pattern)
    if em:
        a_kind, a_vers, a_props = _parse_single_node(em.group("a"))
        b_kind, b_vers, b_props = _parse_single_node(em.group("b"))
        _refuse_ignored_labels(a_kind, a_vers, "MERGE (edge) left endpoint", False)
        _refuse_ignored_labels(b_kind, b_vers, "MERGE (edge) right endpoint", False)
        e_props = _parse_props(em.group("props"))
        return ("edge", a_props, em.group("rel"), e_props, b_props)
    kind, _versions, props = _parse_single_node(pattern)
    _refuse_ignored_labels(kind, _versions, "MERGE (node)", True)
    nm = _NODE.fullmatch(pattern)
    var = nm.group("var") if nm else None
    on_create: dict = {}
    on_match: dict = {}
    for oc in _ON_CLAUSE_RX.finditer(clauses):
        if var is None:
            raise CypherError(
                "ON CREATE/ON MATCH SET needs a named node variable"
            )
        parsed = _parse_assignments(oc.group("assigns"), var)
        if oc.group("kind").upper() == "CREATE":
            on_create.update(parsed)
        else:
            on_match.update(parsed)
    return ("node", kind, props, on_create, on_match)


# FOREACH (x IN <list> | <one write clause using x>) — openCypher's bulk
# write iterator. Lists here are parse-time values (a [..] literal or a
# $param list, the same contract UNWIND's parameter lists have), so the
# iteration count is known before any job runs.
_FOREACH_RX = re.compile(
    r"(?is)^\s*FOREACH\s*\(\s*(?P<var>\w+)\s+IN\s+"
    r"(?P<list>\[[^\]]*\]|\$\w+)\s*\|\s*(?P<body>.*)\)\s*$"
)
# same-template MERGE bodies collapse into ONE batched join whatever the
# list size; bodies that must run sequentially (SET/REMOVE/DELETE/CREATE)
# stack one Spark plan per element, so their cap is much lower.
MAX_FOREACH_BATCH = 1000
MAX_FOREACH_SEQ = 100


def _foreach_elements(list_text: str) -> list:
    if list_text.startswith("$"):
        from codegraphdb_spark.plans.cypher import _param_value

        vals = _param_value(list_text[1:])
    else:
        vals = _literal(list_text)
    if not isinstance(vals, list):
        raise CypherError("FOREACH needs a list to iterate")
    for v in vals:
        if isinstance(v, bool) or not isinstance(v, (str, int)):
            raise CypherError(
                f"FOREACH elements must be str or int (got {type(v).__name__})"
            )
    return vals


def _substitute_var(body: str, var: str, value) -> str:
    """Replace whole-token uses of the loop variable OUTSIDE string
    literals with the element rendered in the strict literal syntax.
    Tokens preceded by '.'/':'/'$' (property access on another var, a
    label, a parameter) or used as a map KEY (followed by ':') are not the
    loop variable."""
    if isinstance(value, str):
        if "'" in value or '"' in value or "\n" in value:
            raise CypherError(
                "FOREACH element contains a quote/newline — not "
                "representable in the strict literal syntax"
            )
        lit = f"'{value}'"
    else:
        lit = str(value)
    spans = _string_spans(body)
    # lookbehind/lookahead exclude backticks: :`x` is a (backticked)
    # label even when its text equals the loop variable. ':' is NOT in the
    # lookbehind (ADVICE r5): a colon right before the token is a LABEL
    # marker only in a pattern head (brace depth 0); inside a map literal
    # ({full_name:x}, no space) it is the key separator and the token IS a
    # value use of the loop variable — decided per match by brace depth.
    rx = re.compile(rf"(?<![\w.$`]){re.escape(var)}(?![\w.`])(?!\s*:)")
    depth_at = [0] * (len(body) + 1)
    d = 0
    for i, ch in enumerate(body):
        if not any(a <= i < b for a, b in spans):
            if ch == "{":
                d += 1
            elif ch == "}":
                d = max(0, d - 1)
        depth_at[i + 1] = d
    out: list[str] = []
    last = 0
    changed = False
    for m in rx.finditer(body):
        if any(a <= m.start() < b for a, b in spans):
            continue
        j = m.start() - 1
        while j >= 0 and body[j] in " \t\n":
            j -= 1
        if j >= 0 and body[j] == ":" and depth_at[m.start()] == 0:
            continue  # label position (e.g. MERGE (n:x)), not a value use
        out.append(body[last : m.start()])
        out.append(lit)
        last = m.end()
        changed = True
    out.append(body[last:])
    if not changed:
        raise CypherError(
            f"FOREACH body never uses the loop variable {var!r} — "
            "a fixed statement repeated N times is almost certainly a bug"
        )
    return "".join(out)


def _run_foreach(
    fm: re.Match,
    nodes: DataFrame,
    edges: DataFrame,
    version: str,
    params: dict,
) -> tuple[DataFrame, DataFrame]:
    var = fm.group("var")
    body = fm.group("body").strip()
    if re.match(r"(?is)^\s*FOREACH\b", body):
        raise CypherError("nested FOREACH is not supported")
    elements = _foreach_elements(fm.group("list").strip())
    if not elements:
        return nodes, edges
    if len(elements) > MAX_FOREACH_BATCH:
        raise CypherError(
            f"FOREACH list has {len(elements)} elements (cap "
            f"{MAX_FOREACH_BATCH}) — load bulk data through the engine's "
            "merge operators, not a Cypher literal"
        )
    bodies = [_substitute_var(body, var, v) for v in elements]
    parsed = [_parse_merge_stmt(b) for b in bodies]
    # Batch path: every element is a MERGE from the SAME template —
    # identical kind/rel, property KEYS, and ON clauses (only substituted
    # VALUES differ) — so the whole list compiles to one set-oriented
    # upsert: one full_outer join however long the list.
    if all(p is not None and p[0] == "node" for p in parsed):
        kinds = {p[1] for p in parsed}
        prop_keys = {frozenset(p[2]) for p in parsed}
        on_cs = {tuple(sorted(p[3].items())) for p in parsed}
        on_ms = {tuple(sorted(p[4].items())) for p in parsed}
        if (
            len(kinds) == 1
            and len(prop_keys) == 1
            and len(on_cs) == 1
            and len(on_ms) == 1
        ):
            return (
                _merge_node(
                    nodes,
                    parsed[0][1],
                    [p[2] for p in parsed],
                    version,
                    on_create=parsed[0][3],
                    on_match=parsed[0][4],
                ),
                edges,
            )
    if all(p is not None and p[0] == "edge" for p in parsed):
        rels = {p[2] for p in parsed}
        e_keys = {frozenset(p[3]) for p in parsed}
        if len(rels) == 1 and len(e_keys) == 1:
            return _merge_edge(
                nodes,
                edges,
                [(p[1], p[3], p[4]) for p in parsed],
                parsed[0][2],
                version,
            )
    # Sequential fallback (SET/REMOVE/DELETE/CREATE bodies, or MERGEs
    # whose templates diverge after substitution): each element threads
    # the previous result, stacking one plan per element — capped low
    # because the lineage depth is the cost, not the row count.
    if len(elements) > MAX_FOREACH_SEQ:
        raise CypherError(
            f"FOREACH with a non-batchable body caps at {MAX_FOREACH_SEQ} "
            f"elements (got {len(elements)}) — this body stacks one plan "
            "per element"
        )
    for b in bodies:
        nodes, edges = run_cypher_write(b, nodes, edges, version, params)
    return nodes, edges


def run_cypher_write(
    query: str,
    nodes: DataFrame,
    edges: DataFrame,
    version: str = "v1",
    params: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Execute one write statement; returns the new (nodes, edges)."""
    _PARAMS.d = params or {}
    try:
        fm = _FOREACH_RX.fullmatch(query)
        if fm:
            return _run_foreach(fm, nodes, edges, version, params or {})
        m = _CREATE_RX.fullmatch(query)
        if m:
            pattern = m.group("pattern").strip()
            em = _EDGE_MERGE_RX.fullmatch(pattern)
            if em:
                a_kind, a_vers, a_props = _parse_single_node(em.group("a"))
                b_kind, b_vers, b_props = _parse_single_node(em.group("b"))
                _refuse_ignored_labels(a_kind, a_vers, "CREATE (edge) left endpoint", False)
                _refuse_ignored_labels(b_kind, b_vers, "CREATE (edge) right endpoint", False)
                e_props = _parse_props(em.group("props"))
                src = _require_key(a_props, "CREATE (edge) left endpoint")
                dst = _require_key(b_props, "CREATE (edge) right endpoint")
                rel = em.group("rel")
                exists = (
                    edges.filter(
                        (F.col("src") == src)
                        & (F.col("dst") == dst)
                        & (F.col("rel_type") == rel)
                    )
                    .limit(1)
                    .count()
                )
                if exists:
                    raise CypherError(
                        f"CREATE would duplicate edge ({src!r})-[:{rel}]->"
                        f"({dst!r}) — use MERGE for upsert"
                    )
                return _merge_edge(
                    nodes, edges, [(a_props, e_props, b_props)], rel, version
                )
            kind, _versions, props = _parse_single_node(pattern)
            _refuse_ignored_labels(kind, _versions, "CREATE (node)", True)
            full_name = _require_key(props, "CREATE (node)")
            if nodes.filter(F.col("full_name") == full_name).limit(1).count():
                raise CypherError(
                    f"CREATE would duplicate node identity {full_name!r} "
                    "(full_name is the merge key) — use MERGE for upsert"
                )
            return _merge_node(nodes, kind, props, version), edges
        parsed = _parse_merge_stmt(query)
        if parsed is not None:
            if parsed[0] == "edge":
                _, a_props, rel, e_props, b_props = parsed
                return _merge_edge(
                    nodes, edges, [(a_props, e_props, b_props)], rel, version
                )
            _, kind, props, on_create, on_match = parsed
            return (
                _merge_node(
                    nodes, kind, props, version,
                    on_create=on_create, on_match=on_match,
                ),
                edges,
            )
        m = _SET_RX.fullmatch(query)
        if m:
            nm = _NODE.fullmatch(m.group("pattern").strip())
            if not nm:
                raise CypherError(
                    f"cannot parse MATCH pattern {m.group('pattern')!r}"
                )
            kind, versions = _parse_labels(nm.group("labels") or "")
            props = _parse_props(nm.group("props"))
            var = nm.group("var")
            if not var:
                raise CypherError("SET requires a named node variable")
            return (
                _set_props(nodes, kind, versions, props, var, m.group("assigns")),
                edges,
            )
        m = _REMOVE_RX.fullmatch(query)
        if m:
            nm = _NODE.fullmatch(m.group("pattern").strip())
            if not nm:
                raise CypherError(
                    f"cannot parse MATCH pattern {m.group('pattern')!r}"
                )
            kind, versions = _parse_labels(nm.group("labels") or "")
            props = _parse_props(nm.group("props"))
            var = nm.group("var")
            if not var:
                raise CypherError("REMOVE requires a named node variable")
            return (
                _remove_props(nodes, kind, versions, props, var, m.group("items")),
                edges,
            )
        m = _DELETE_RX.fullmatch(query)
        if m:
            nm = _NODE.fullmatch(m.group("pattern").strip())
            if not nm:
                raise CypherError(
                    f"cannot parse MATCH pattern {m.group('pattern')!r}"
                )
            if nm.group("var") != m.group("var"):
                raise CypherError(
                    f"DELETE variable {m.group('var')!r} is not the matched "
                    f"{nm.group('var')!r}"
                )
            kind, versions = _parse_labels(nm.group("labels") or "")
            props = _parse_props(nm.group("props"))
            return _delete(
                nodes, edges, kind, versions, props, bool(m.group("detach"))
            )
        raise CypherError(
            "unsupported write statement (expected CREATE or MERGE node/edge, "
            "MATCH..SET, MATCH..REMOVE, or MATCH..[DETACH] DELETE)"
        )
    finally:
        _PARAMS.d = None
