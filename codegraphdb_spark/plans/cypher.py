"""Cypher-subset front end: compiles the reference's query shapes to
DataFrame plans (SURVEY §4 custom work item 3 — "sugar over spark.sql, not
a Catalyst rule").

The reference's user-facing surface is arbitrary Cypher delegated to Neo4j
(execute_query, graphDB.py:106-112); every query it actually issues is a
node match or a 1-hop expansion (C1–C6, e.g. graphDB.py:269-272,
ast_manage.py:24-62). This module accepts exactly that subset so reference
users can run their existing queries verbatim:

    MATCH (c:`v1`:CLASS {name: 'Person'}) RETURN c
    MATCH (m:MODULE {full_name: 'pkg.mod'})-[:CONTAINS]->(c) RETURN
        c.full_name, labels(c)
    ... LIMIT n

Label semantics mirror the reference: a label that is a known KIND filters
``kind``; any other label is a version tag and filters
``array_contains(versions, label)`` (the reference stamps task_id labels
alongside kind labels, graphDB.py:75-78).

Compilation targets: node pattern → filtered scan; edge pattern → edge
filter + two node joins (broadcast-friendly — the bound side is usually a
handful of rows). RETURN items project; ``labels(x)`` returns
[kind] ++ versions like Neo4j would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codegraphdb_spark.datamodel import KINDS

_NODE = re.compile(
    r"\(\s*(?P<var>\w+)\s*(?P<labels>(?::(?:`[^`]+`|\w+))*)\s*(?:\{(?P<props>[^}]*)\})?\s*\)"
)
_EDGE = re.compile(r"-\s*\[\s*:(?P<rel>\w+)\s*\]\s*->")
_PROP = re.compile(r"(\w+)\s*:\s*(?:'([^']*)'|\"([^\"]*)\"|(\d+))")
_RETURN = re.compile(r"\bRETURN\b(?P<items>.+?)(?:\bLIMIT\b\s*(?P<limit>\d+))?\s*$",
                     re.IGNORECASE | re.DOTALL)
_ITEM = re.compile(
    r"^\s*(?:(?P<func>labels)\s*\(\s*(?P<fvar>\w+)\s*\)|(?P<var>\w+)(?:\.(?P<prop>\w+))?)"
    r"(?:\s+AS\s+(?P<alias>\w+))?\s*$",
    re.IGNORECASE,
)

_REAL_KINDS = {k for k in KINDS if k != "none"} | {"none"}


class CypherError(ValueError):
    pass


def _parse_labels(raw: str) -> tuple[str | None, list[str]]:
    """':`v1`:CLASS' → (kind, [versions])."""
    kind = None
    versions: list[str] = []
    for m in re.finditer(r":(`[^`]+`|\w+)", raw or ""):
        label = m.group(1).strip("`")
        if label in _REAL_KINDS:
            if kind is not None:
                raise CypherError(f"two kind labels: {kind}, {label}")
            kind = label
        else:
            versions.append(label)
    return kind, versions


def _parse_props(raw: str | None) -> dict[str, object]:
    if not raw or not raw.strip():
        return {}
    props: dict[str, object] = {}
    for m in _PROP.finditer(raw):
        key = m.group(1)
        props[key] = int(m.group(4)) if m.group(4) is not None else (
            m.group(2) if m.group(2) is not None else m.group(3)
        )
    return props


def _node_filter(nodes: DataFrame, kind, versions, props) -> DataFrame:
    df = nodes
    if kind:
        df = df.filter(F.col("kind") == kind)
    for v in versions:
        df = df.filter(F.array_contains("versions", v))
    for k, val in props.items():
        df = df.filter(F.col(k) == val)
    return df


def _labels_col(prefix: str):
    return F.concat(F.array(F.col(f"{prefix}.kind")), F.col(f"{prefix}.versions"))


def run_cypher(cypher: str, nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Compile + run a Cypher-subset query against (nodes, edges)."""
    text = cypher.strip()
    if not re.match(r"(?is)^\s*MATCH\b", text):
        raise CypherError("only MATCH ... RETURN ... [LIMIT n] is supported")

    mret = _RETURN.search(text)
    if not mret:
        raise CypherError("missing RETURN clause")
    pattern_part = text[: mret.start()]

    node_matches = list(_NODE.finditer(pattern_part))
    edge_match = _EDGE.search(pattern_part)
    if not node_matches:
        raise CypherError("no node pattern found")

    binds: dict[str, str] = {}  # var -> dataframe alias
    if edge_match and len(node_matches) >= 2:
        lvar = node_matches[0].group("var")
        rvar = node_matches[1].group("var")
        lkind, lver = _parse_labels(node_matches[0].group("labels"))
        rkind, rver = _parse_labels(node_matches[1].group("labels"))
        lprops = _parse_props(node_matches[0].group("props"))
        rprops = _parse_props(node_matches[1].group("props"))
        rel = edge_match.group("rel")

        left = _node_filter(nodes, lkind, lver, lprops).alias("l")
        right = _node_filter(nodes, rkind, rver, rprops).alias("r")
        e = edges.filter(F.col("rel_type") == rel).alias("e")
        df = (
            e.join(left, F.col("e.src") == F.col("l.full_name"))
            .join(right, F.col("e.dst") == F.col("r.full_name"))
        )
        binds = {lvar: "l", rvar: "r"}
    else:
        var = node_matches[0].group("var")
        kind, ver = _parse_labels(node_matches[0].group("labels"))
        props = _parse_props(node_matches[0].group("props"))
        df = _node_filter(nodes, kind, ver, props).alias("n")
        binds = {var: "n"}

    cols = []
    for raw_item in _split_items(mret.group("items")):
        m = _ITEM.match(raw_item)
        if not m:
            raise CypherError(f"cannot parse RETURN item: {raw_item!r}")
        alias = m.group("alias")
        if m.group("func"):
            var = m.group("fvar")
            if var not in binds:
                raise CypherError(f"unbound variable {var!r}")
            cols.append(_labels_col(binds[var]).alias(alias or f"labels_{var}"))
        else:
            var, prop = m.group("var"), m.group("prop")
            if var not in binds:
                raise CypherError(f"unbound variable {var!r}")
            p = binds[var]
            if prop:
                cols.append(F.col(f"{p}.{prop}").alias(alias or f"{var}_{prop}"))
            else:
                # whole-node return → its identity + kind (a stable, hashable
                # projection of the reference's Node record)
                cols.append(F.col(f"{p}.full_name").alias(alias or f"{var}_full_name"))
                cols.append(F.col(f"{p}.kind").alias(f"{var}_kind"))
    out = df.select(*cols)
    if mret.group("limit"):
        out = out.limit(int(mret.group("limit")))
    return out


def _split_items(items: str) -> list[str]:
    """Split RETURN items on commas (no nested parens in the subset except
    labels(x), which contains no commas)."""
    return [s for s in (p.strip() for p in items.split(",")) if s]
