"""Cypher-subset front end: compiles the reference's query shapes to
DataFrame plans (SURVEY §4 custom work item 3 — "sugar over spark.sql, not
a Catalyst rule").

The reference's user-facing surface is arbitrary Cypher delegated to Neo4j
(execute_query, graphDB.py:106-112); every query it actually issues is a
node match or a 1-hop expansion (C1–C6, e.g. graphDB.py:269-272,
ast_manage.py:24-62). This module accepts that subset — plus the natural
generalizations a reference user would reach for next — so existing
queries run verbatim:

    MATCH (c:`v1`:CLASS {name: 'Person'}) RETURN c
    MATCH (m:MODULE {full_name: 'pkg.mod'})-[:CONTAINS]->(c) RETURN
        c.full_name, labels(c)
    MATCH (m:MODULE)-[:CONTAINS]->(c:CLASS)-[:HAS_METHOD]->(f)
        WHERE m.full_name STARTS WITH 'pkg' AND f.name <> '__init__'
        RETURN c.full_name, f.name ORDER BY c.full_name LIMIT 10
    MATCH (a:CLASS)-[:INHERITS*1..3]->(b:CLASS) RETURN a.name, b.name
    MATCH (c:CLASS) RETURN count(c) AS n

Label semantics mirror the reference: a label that is a known KIND filters
``kind``; any other label is a version tag and filters
``array_contains(versions, label)`` (the reference stamps task_id labels
alongside kind labels, graphDB.py:75-78).

Compilation targets: node pattern → filtered scan; each hop → edge filter
+ node join (broadcast-friendly — the bound side is usually a handful of
rows); ``[:R*a..b]`` → a bounded reachability expansion (iterated
self-join of the filtered edge set, deduped per hop — the E1 pattern);
WHERE/ORDER BY/LIMIT → filter/orderBy/limit. ``labels(x)`` returns
[kind] ++ versions like Neo4j would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codegraphdb_spark.datamodel import KINDS

_NODE = re.compile(
    r"\(\s*(?P<var>\w+)?\s*(?P<labels>(?::(?:`[^`]+`|\w+))*)\s*(?:\{(?P<props>[^}]*)\})?\s*\)"
)
_EDGE = re.compile(
    r"-\s*\[\s*:(?P<rel>\w+)\s*(?:\*\s*(?P<lo>\d+)?\s*(?:\.\.\s*(?P<hi>\d+)?)?)?\s*\]\s*->"
)
_PROP = re.compile(r"(\w+)\s*:\s*(?:'([^']*)'|\"([^\"]*)\"|(\d+))")
_CLAUSES = re.compile(
    r"^\s*MATCH\b(?P<pattern>.*?)(?:\bWHERE\b(?P<where>.*?))?\bRETURN\b"
    r"(?P<distinct>\s+DISTINCT\b)?(?P<items>.*?)"
    r"(?:\bORDER\s+BY\b(?P<order>.*?))?(?:\bLIMIT\b\s*(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ITEM = re.compile(
    r"^\s*(?:(?P<func>labels|count)\s*\(\s*(?P<farg>\*|\w+)\s*\)"
    r"|(?P<var>\w+)(?:\.(?P<prop>\w+))?)"
    r"(?:\s+AS\s+(?P<alias>\w+))?\s*$",
    re.IGNORECASE,
)
_PRED = re.compile(
    r"^\s*(?P<var>\w+)\.(?P<prop>\w+)\s*"
    r"(?P<op><>|!=|<=|>=|=|<|>|STARTS\s+WITH|ENDS\s+WITH|CONTAINS|IN)\s*"
    r"(?P<val>.+?)\s*$",
    re.IGNORECASE,
)
_ORDER_ITEM = re.compile(
    r"^\s*(?P<var>\w+)(?:\.(?P<prop>\w+))?(?:\s+(?P<dir>ASC|DESC))?\s*$", re.IGNORECASE
)

_REAL_KINDS = {k for k in KINDS if k != "none"} | {"none"}

# Reachability expansions beyond this many hops refuse loudly rather than
# silently truncating (inheritance chains deeper than this don't occur in
# real code; an unbounded `*` defaults to this cap).
MAX_VARLEN_HOPS = 10


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


def _prefixed(df: DataFrame, prefix: str) -> DataFrame:
    """Rename every column to ``{prefix}__{col}``. The pattern chains
    self-joins of nodes/edges; flat unique names sidestep Spark's
    ambiguous-self-join resolution entirely (alias-qualified F.col refs
    can silently drop join constraints when both sides share lineage)."""
    return df.select([F.col(c).alias(f"{prefix}__{c}") for c in df.columns])


def _labels_col(prefix: str):
    return F.concat(
        F.array(F.col(f"{prefix}__kind")), F.col(f"{prefix}__versions")
    )


def _varlen_pairs(edges: DataFrame, rel: str, lo: int, hi: int) -> DataFrame:
    """(src, dst) pairs connected by a directed path of lo..hi ``rel``
    edges. Bounded iterated self-join with per-hop dedup — same shape as
    the E1 closure (operators/closure.py), kept inline because LIMIT-less
    reachability here is hop-bounded by construction."""
    base = edges.filter(F.col("rel_type") == rel).select("src", "dst").dropDuplicates()
    step = base.select(F.col("src").alias("mid"), F.col("dst").alias("dst"))
    hop = base
    out = hop if lo <= 1 else None
    for depth in range(2, hi + 1):
        hop = (
            hop.select("src", F.col("dst").alias("mid"))
            .join(step, "mid")
            .select("src", "dst")
            .dropDuplicates()
        )
        if depth >= lo:
            out = hop if out is None else out.unionByName(hop)
    if out is None:
        raise CypherError(f"empty hop range *{lo}..{hi}")
    return out.dropDuplicates()


def _parse_pattern(pattern: str):
    """Alternating node/edge specs, in textual order."""
    tokens = []
    pos = 0
    while pos < len(pattern):
        mn = _NODE.match(pattern, pos) if pattern[pos] == "(" else None
        me = _EDGE.match(pattern, pos) if pattern[pos] == "-" else None
        if mn:
            tokens.append(("node", mn))
            pos = mn.end()
        elif me:
            tokens.append(("edge", me))
            pos = me.end()
        elif pattern[pos].isspace() or pattern[pos] == ",":
            pos += 1
        else:
            raise CypherError(f"cannot parse pattern at: {pattern[pos:pos+30]!r}")
    if not tokens or tokens[0][0] != "node" or tokens[-1][0] != "node":
        raise CypherError("pattern must start and end with a node")
    for i, (t, _) in enumerate(tokens):
        if t != ("node" if i % 2 == 0 else "edge"):
            raise CypherError("pattern must alternate nodes and edges")
    return tokens


def _literal(raw: str):
    raw = raw.strip()
    if re.fullmatch(r"'[^']*'", raw) or re.fullmatch(r'"[^"]*"', raw):
        return raw[1:-1]
    if raw.startswith("[") and raw.endswith("]"):
        return [_literal(p) for p in raw[1:-1].split(",") if p.strip()]
    try:
        return int(raw)
    except ValueError:
        raise CypherError(f"cannot parse literal {raw!r}") from None


def _where_condition(where: str, binds: dict[str, str]):
    """Conjunction of simple predicates (AND only — the subset stays
    loud-and-predictable; OR/NOT would silently change join pruning)."""
    cond = None
    for raw in re.split(r"(?i)\bAND\b", where):
        if not raw.strip():
            continue
        m = _PRED.match(raw)
        if not m:
            raise CypherError(f"cannot parse WHERE predicate: {raw.strip()!r}")
        var = m.group("var")
        if var not in binds:
            raise CypherError(f"unbound variable {var!r} in WHERE")
        col = F.col(f"{binds[var]}__{m.group('prop')}")
        op = re.sub(r"\s+", " ", m.group("op").upper())
        val = _literal(m.group("val"))
        if op == "=":
            pred = col == val
        elif op in ("<>", "!="):
            pred = col != val
        elif op == "<":
            pred = col < val
        elif op == "<=":
            pred = col <= val
        elif op == ">":
            pred = col > val
        elif op == ">=":
            pred = col >= val
        elif op == "STARTS WITH":
            pred = col.startswith(str(val))
        elif op == "ENDS WITH":
            pred = col.endswith(str(val))
        elif op == "CONTAINS":
            pred = col.contains(str(val))
        elif op == "IN":
            if not isinstance(val, list):
                raise CypherError("IN needs a [list] literal")
            pred = col.isin(val)
        else:  # pragma: no cover
            raise CypherError(f"unsupported operator {op!r}")
        cond = pred if cond is None else (cond & pred)
    if cond is None:
        raise CypherError("empty WHERE clause")
    return cond


def run_cypher(cypher: str, nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Compile + run a Cypher-subset query against (nodes, edges)."""
    text = cypher.strip()
    m = _CLAUSES.match(text)
    if not m:
        raise CypherError(
            "only MATCH ... [WHERE ...] RETURN [DISTINCT] ... "
            "[ORDER BY ...] [LIMIT n] is supported"
        )

    tokens = _parse_pattern(m.group("pattern"))

    binds: dict[str, str] = {}  # var -> dataframe alias
    df = None
    anon = 0
    prev_alias = None
    for i, (ttype, tok) in enumerate(tokens):
        if ttype == "node":
            alias = f"n{i // 2}"
            kind, ver = _parse_labels(tok.group("labels"))
            props = _parse_props(tok.group("props"))
            nd = _prefixed(_node_filter(nodes, kind, ver, props), alias)
            var = tok.group("var")
            if var:
                if var in binds:
                    raise CypherError(f"variable {var!r} bound twice")
                binds[var] = alias
            if df is None:
                df = nd
            else:
                # previous token was an edge ending at this node
                df = df.join(
                    nd,
                    F.col(f"e{anon - 1}__dst") == F.col(f"{alias}__full_name"),
                )
            prev_alias = alias
        else:
            rel = tok.group("rel")
            lo_s, hi_s = tok.group("lo"), tok.group("hi")
            if lo_s is None and hi_s is None and "*" not in tok.group(0):
                lo = hi = 1
            else:
                lo = int(lo_s) if lo_s else 1
                hi = int(hi_s) if hi_s else (int(lo_s) if lo_s and hi_s is None and ".." not in tok.group(0) else MAX_VARLEN_HOPS)
            if hi > MAX_VARLEN_HOPS:
                raise CypherError(f"hop bound {hi} exceeds cap {MAX_VARLEN_HOPS}")
            if lo > hi or lo < 1:
                raise CypherError(f"bad hop range *{lo}..{hi}")
            ealias = f"e{anon}"
            anon += 1
            if lo == 1 and hi == 1:
                e = edges.filter(F.col("rel_type") == rel)
            else:
                e = _varlen_pairs(edges, rel, lo, hi)
            df = df.join(
                _prefixed(e, ealias),
                F.col(f"{prev_alias}__full_name") == F.col(f"{ealias}__src"),
            )

    if m.group("where"):
        df = df.filter(_where_condition(m.group("where"), binds))

    cols = []
    agg_cols = []
    for raw_item in _split_items(m.group("items")):
        it = _ITEM.match(raw_item)
        if not it:
            raise CypherError(f"cannot parse RETURN item: {raw_item!r}")
        alias = it.group("alias")
        func = (it.group("func") or "").lower()
        if func == "count":
            arg = it.group("farg")
            if arg != "*" and arg not in binds:
                raise CypherError(f"unbound variable {arg!r}")
            agg_cols.append(F.count(F.lit(1)).alias(alias or "count"))
        elif func == "labels":
            var = it.group("farg")
            if var not in binds:
                raise CypherError(f"unbound variable {var!r}")
            cols.append(_labels_col(binds[var]).alias(alias or f"labels_{var}"))
        else:
            var, prop = it.group("var"), it.group("prop")
            if var not in binds:
                raise CypherError(f"unbound variable {var!r}")
            p = binds[var]
            if prop:
                cols.append(F.col(f"{p}__{prop}").alias(alias or f"{var}_{prop}"))
            else:
                # whole-node return → its identity + kind (a stable, hashable
                # projection of the reference's Node record)
                cols.append(F.col(f"{p}__full_name").alias(alias or f"{var}_full_name"))
                cols.append(F.col(f"{p}__kind").alias(f"{var}_kind"))
    if agg_cols and cols:
        raise CypherError("mixing count() with non-aggregated items is unsupported")
    if agg_cols:
        out = df.agg(*agg_cols)
    else:
        out = df.select(*cols)
        if m.group("distinct"):
            out = out.dropDuplicates()

    if m.group("order"):
        order_cols = []
        out_cols = set(out.columns)
        for raw in m.group("order").split(","):
            om = _ORDER_ITEM.match(raw)
            if not om:
                raise CypherError(f"cannot parse ORDER BY item: {raw.strip()!r}")
            var, prop = om.group("var"), om.group("prop")
            name = f"{var}_{prop}" if prop else var
            if name not in out_cols and var in out_cols and not prop:
                name = var
            if name not in out_cols:
                raise CypherError(
                    f"ORDER BY {raw.strip()!r} must reference a returned column"
                )
            c = F.col(name)
            if om.group("dir") and om.group("dir").upper() == "DESC":
                c = c.desc()
            order_cols.append(c)
        out = out.orderBy(*order_cols)

    if m.group("limit"):
        out = out.limit(int(m.group("limit")))
    return out


def _split_items(items: str) -> list[str]:
    """Split RETURN items on commas outside parens (labels(x)/count(x)
    contain no commas in the subset)."""
    return [s for s in (p.strip() for p in items.split(",")) if s]
