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
    MATCH (c:CLASS)-[:HAS_METHOD]->(m)
        RETURN c.name, count(m), collect(m.name)   -- implicit grouping
    MATCH (c:CLASS)-[:HAS_METHOD]->(m)
        WITH c, count(m) AS n WHERE n > 2          -- pipeline + HAVING
        MATCH (c)-[:INHERITS]->(b) RETURN c.name, b.name, n
    MATCH (n:`v1`) WHERE exists(n.file_path)
        RETURN n.full_name, n.file_path ORDER BY n.full_name SKIP 2 LIMIT 3
    MATCH (c:CLASS) OPTIONAL MATCH (c)-[:INHERITS]->(b) RETURN c.name, b.name
    MATCH (c:CLASS {name: 'Dog'})-[:HAS_METHOD]->(m:METHOD)
        RETURN m.name, m.signature, m.code   -- code = lazy <CODE> pointer
    MATCH (c:CLASS {name: $who}) WHERE c.name =~ 'D.*' RETURN c  -- params/regex
    UNWIND $names AS nm MATCH (c:CLASS) WHERE c.name = nm RETURN nm, c.full_name
    MATCH (c:CLASS) WHERE (c)-[:HAS_METHOD]->(:METHOD {name: 'speak'})
        AND NOT (c)-[:INHERITS]->(:CLASS) RETURN c.name  -- pattern predicates
    MATCH (c:CLASS) WHERE EXISTS { MATCH (c)-[:HAS_METHOD]->(m)
        WHERE m.name = 'fetch' } RETURN c.name           -- EXISTS subquery
    MATCH (c:CLASS)-[:HAS_METHOD]->(m) RETURN count(DISTINCT m.name),
        CASE WHEN c.name = 'Animal' THEN 'root' ELSE 'derived' END AS tier
    MATCH (n:METHOD) RETURN toUpper(n.name), size(n.versions),
        coalesce(n.file_path, '<none>'), substring(n.full_name, 0, 4),
        replace(n.name, 'o', '0')          -- scalar string/list functions
    MATCH (m:MODULE)-[r:CONTAINS]->(c) WHERE r.association_type = 'CLASS'
        RETURN c.full_name, r.association_type  -- relationship variables
    MATCH (c:CLASS)-[:HAS_METHOD]->(m) WITH c, count(m) AS n
        ORDER BY n DESC, c.full_name LIMIT 2 MATCH ...  -- WITH pagination
    MATCH (c:CLASS) RETURN c.full_name AS fn
        UNION MATCH (m:MODULE) RETURN m.full_name AS fn  -- UNION [ALL]

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
import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codegraphdb_spark.datamodel import KINDS
from codegraphdb_spark.functions.code_ptr import encode_code_pointer

_NODE = re.compile(
    r"\(\s*(?P<var>\w+)?\s*(?P<labels>(?::(?:`[^`]+`|[\w/.]+))*)\s*(?:\{(?P<props>[^}]*)\})?\s*\)"
)
_EDGE = re.compile(
    r"(?P<left><)?-\s*\[\s*(?P<evar>\w+)?\s*:(?P<rel>\w+)\s*"
    r"(?:\*\s*(?P<lo>\d+)?\s*(?:\.\.\s*(?P<hi>\d+)?)?)?\s*"
    r"(?:\{(?P<props>[^}]*)\})?\s*\]\s*-(?P<right>>)?"
)
_PROP = re.compile(r"(\w+)\s*:\s*(?:'([^']*)'|\"([^\"]*)\"|(\d+)|\$(\w+))")
# allShortestPaths accepted as an alias: the compiled projection is the
# per-pair MINIMUM hop distance (length(p)); Neo4j's distinction — one
# witness path vs every witness path — only matters when projecting the
# path OBJECT, which var-length chains refuse anyway (see plain_pvar).
_SHORTEST_RX = re.compile(
    r"(?is)^\s*(?P<pvar>\w+)\s*=\s*(?:all)?shortestPaths?\s*\(\s*(?P<inner>.*)\s*\)\s*$"
)
_ITEM = re.compile(
    r"^\s*(?:(?P<func>labels|count|collect|min|max|sum|avg|length|nodes|relationships|type)\s*\(\s*"
    r"(?P<farg>\*|(?:DISTINCT\s+)?\w+(?:\.\w+)?)\s*\)"
    r"|(?P<var>\w+)(?:\.(?P<prop>\w+))?)"
    r"(?:\s+AS\s+(?P<alias>\w+))?\s*$",
    re.IGNORECASE,
)
_EXISTS_RX = re.compile(r"(?i)^\s*exists\s*\(\s*(?P<var>\w+)\.(?P<prop>\w+)\s*\)\s*$")
_PLAIN_PRED = re.compile(
    r"^\s*(?P<name>\w+)\s*"
    r"(?P<op>=~|<>|!=|<=|>=|=|<|>|STARTS\s+WITH|ENDS\s+WITH|CONTAINS|IN)\s*"
    r"(?P<val>.+?)\s*$",
    re.IGNORECASE,
)
_IS_NULL_RX = re.compile(
    r"(?i)^\s*(?P<var>\w+)\.(?P<prop>\w+)\s+IS\s+(?P<neg>NOT\s+)?NULL\s*$"
)
_PRED = re.compile(
    r"^\s*(?P<var>\w+)\.(?P<prop>\w+)\s*"
    r"(?P<op>=~|<>|!=|<=|>=|=|<|>|STARTS\s+WITH|ENDS\s+WITH|CONTAINS|IN)\s*"
    r"(?P<val>.+?)\s*$",
    re.IGNORECASE,
)
_ORDER_ITEM = re.compile(
    r"^\s*(?P<var>\w+)(?:\.(?P<prop>\w+))?(?:\s+(?P<dir>ASC|DESC))?\s*$", re.IGNORECASE
)

# every kind is a label, INCLUDING 'none' — placeholder nodes (endpoints
# seen before definition, graphDB.py:72-80) are queryable as :none
_REAL_KINDS = set(KINDS)

# Reachability expansions beyond this many hops refuse loudly rather than
# silently truncating (inheritance chains deeper than this don't occur in
# real code; an unbounded `*` defaults to this cap).
MAX_VARLEN_HOPS = 10


class CypherError(ValueError):
    pass


# query parameters for the active run_cypher call (Neo4j's $param surface,
# graphDB.py passes literal-interpolated strings instead — parameters are
# the safe spelling). Thread-local because fixture builds/queries run from
# concurrent driver threads; set/reset by run_cypher around compilation.
_PARAMS = threading.local()


def _param_value(name: str):
    d = getattr(_PARAMS, "d", None)
    if d is None or name not in d:
        raise CypherError(
            f"missing query parameter ${name} (pass params={{'{name}': ...}})"
        )
    v = d[name]
    if isinstance(v, bool) or not isinstance(v, (str, int, list)):
        raise CypherError(
            f"parameter ${name} must be a str, int, or list (got {type(v).__name__})"
        )
    if isinstance(v, list) and not all(
        isinstance(x, (str, int)) and not isinstance(x, bool) for x in v
    ):
        raise CypherError(f"parameter ${name}: list items must be str or int")
    return v


def _parse_labels(raw: str) -> tuple[str | None, list[str]]:
    """':`v1`:CLASS' → (kind, [versions]). Unbackticked labels may contain
    '/' and '.' — the reference's task ids look like 'project_cc_python/102'
    (graphDB.py:284) and are written without backticks in its own smoke
    queries."""
    kind = None
    versions: list[str] = []
    for m in re.finditer(r":(`[^`]+`|[\w/.]+)", raw or ""):
        label = m.group(1).strip("`")
        if label in _REAL_KINDS:
            if kind is not None:
                raise CypherError(f"two kind labels: {kind}, {label}")
            kind = label
        else:
            versions.append(label)
    return kind, versions


def _parse_props(raw: str | None) -> dict[str, object]:
    """Parse a {k: v, ...} property map STRICTLY: every comma-separated
    entry must be `name: 'str'|\"str\"|int|$param` — an unparseable entry
    (bare identifier, boolean, negative number) raises instead of silently
    dropping the filter and over-matching."""
    if not raw or not raw.strip():
        return {}
    props: dict[str, object] = {}
    for part in raw.split(","):
        m = _PROP.fullmatch(part.strip())
        if not m:
            raise CypherError(f"cannot parse property entry {part.strip()!r}")
        if m.group(5) is not None:
            props[m.group(1)] = _param_value(m.group(5))
        else:
            props[m.group(1)] = int(m.group(4)) if m.group(4) is not None else (
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


def _varlen_pairs(
    edges: DataFrame,
    rel: str,
    lo: int,
    hi: int,
    undirected: bool = False,
    with_dist: bool = False,
) -> DataFrame:
    """(src, dst) pairs connected by a path of lo..hi ``rel`` edges with
    openCypher RELATIONSHIP UNIQUENESS: no path traverses the same
    relationship twice (Neo4j excludes e.g. the undirected 2-path that
    goes forward then straight back over one edge). Each expansion state
    carries its visited-relationship set, canonicalized with array_sort so
    permutations of the same set dedup together; a hop that would reuse a
    relationship is filtered before the union step. State count is bounded
    by paths-not-walks plus the MAX_VARLEN_HOPS cap — the same cost class
    as Neo4j's own var-length expand. Same bounded-self-join shape as the
    E1 closure (operators/closure.py), kept inline because reachability
    here is hop-bounded by construction."""
    base = edges.filter(F.col("rel_type") == rel).select("src", "dst").dropDuplicates()
    if undirected:
        # relationship key is orientation-INDEPENDENT so forward-then-back
        # over one edge counts as a reuse; symmetrize before expanding so
        # multi-hop paths may mix edge orientations (a->b, c->b: the
        # undirected 2-path a-b-c exists)
        key = F.concat_ws("\x00", F.least("src", "dst"), F.greatest("src", "dst"))
        base = base.unionByName(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates()
    else:
        key = F.concat_ws("\x00", F.col("src"), F.col("dst"))
    step = base.select(
        F.col("src").alias("mid"), F.col("dst").alias("dst"), key.alias("__k")
    )
    hop = base.select("src", "dst", F.array(key).alias("__seen"))
    out = (
        hop.select("src", "dst", F.lit(1).alias("dist")) if lo <= 1 else None
    )
    for depth in range(2, hi + 1):
        hop = (
            hop.select("src", F.col("dst").alias("mid"), "__seen")
            .join(step, "mid")
            .filter(~F.array_contains(F.col("__seen"), F.col("__k")))
            .select(
                "src",
                "dst",
                F.array_sort(
                    F.array_union(F.col("__seen"), F.array(F.col("__k")))
                ).alias("__seen"),
            )
            .dropDuplicates()
        )
        if depth >= lo:
            pairs = hop.select("src", "dst", F.lit(depth).alias("dist"))
            out = pairs if out is None else out.unionByName(pairs)
    if out is None:
        raise CypherError(f"empty hop range *{lo}..{hi}")
    if with_dist:
        # shortestPath(): minimal hop count per reachable pair
        return out.groupBy("src", "dst").agg(F.min("dist").alias("dist"))
    return out.select("src", "dst").dropDuplicates()


def _split_chains(pattern: str) -> list[str]:
    """Split a MATCH pattern on top-level commas (outside (), [], {}, and
    backticks) — 'MATCH (a), (b)-[:R]->(c)' is two independent chains
    combined by product (shared variables add equality constraints)."""
    chains: list[str] = []
    depth = 0
    in_tick = False
    cur: list[str] = []
    for ch in pattern:
        if ch == "`":
            in_tick = not in_tick
        elif not in_tick:
            if ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
            elif ch == "," and depth == 0:
                chains.append("".join(cur))
                cur = []
                continue
        cur.append(ch)
    chains.append("".join(cur))
    out = [c for c in chains if c.strip()]
    if not out:
        raise CypherError("empty MATCH pattern")
    return out


def _parse_pattern(pattern: str):
    """Alternating node/edge specs of ONE chain, in textual order."""
    tokens = []
    pos = 0
    while pos < len(pattern):
        mn = _NODE.match(pattern, pos) if pattern[pos] == "(" else None
        me = _EDGE.match(pattern, pos) if pattern[pos] in "-<" else None
        if mn:
            tokens.append(("node", mn))
            pos = mn.end()
        elif me:
            tokens.append(("edge", me))
            pos = me.end()
        elif pattern[pos].isspace():
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
    if re.fullmatch(r"\$\w+", raw):
        return _param_value(raw[1:])
    if re.fullmatch(r"'[^']*'", raw) or re.fullmatch(r'"[^"]*"', raw):
        return raw[1:-1]
    if raw.startswith("[") and raw.endswith("]"):
        return [_literal(p) for p in raw[1:-1].split(",") if p.strip()]
    try:
        return int(raw)
    except ValueError:
        raise CypherError(f"cannot parse literal {raw!r}") from None


def _split_bool(s: str, word: str) -> list[str]:
    """Split on a top-level boolean keyword (outside parens/brackets and
    string literals), case-insensitive, word-boundary-checked."""
    parts: list[str] = []
    cur: list[str] = []
    depth = 0
    quote: str | None = None
    i, n, wl = 0, len(s), len(word)
    while i < n:
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
            cur.append(ch)
            i += 1
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
            i += 1
            continue
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if (
            depth == 0
            and s[i : i + wl].upper() == word
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (i + wl >= n or not (s[i + wl].isalnum() or s[i + wl] == "_"))
        ):
            parts.append("".join(cur))
            cur = []
            i += wl
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def _outer_parens(s: str) -> bool:
    """True iff s is '( ... )' with the first paren matching the last."""
    if not (s.startswith("(") and s.endswith(")")):
        return False
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i == len(s) - 1
    return False


def _where_condition(where: str, binds: dict[str, str], plain: set[str] | None = None):
    """Boolean expression over simple predicates: AND / OR / NOT with
    parentheses, standard precedence (OR < AND < NOT). ``plain`` names
    bare columns projected by a WITH clause (usable in HAVING position)."""
    ors = [p for p in _split_bool(where, "OR") if p.strip()]
    if not ors:
        raise CypherError("empty WHERE clause")
    if len(ors) > 1:
        cond = _where_condition(ors[0], binds, plain)
        for p in ors[1:]:
            cond = cond | _where_condition(p, binds, plain)
        return cond
    ands = [p for p in _split_bool(where, "AND") if p.strip()]
    if len(ands) > 1:
        cond = _where_condition(ands[0], binds, plain)
        for p in ands[1:]:
            cond = cond & _where_condition(p, binds, plain)
        return cond
    text = where.strip()
    if re.match(r"(?i)^NOT\b", text):
        return ~_where_condition(text[3:], binds, plain)
    if _outer_parens(text):
        return _where_condition(text[1:-1], binds, plain)
    return _predicate(text, binds, plain)


def _predicate(raw: str, binds: dict[str, str], plain: set[str] | None = None):
    # exists(n.prop) — the reference's own bulk-update scan shape
    # (update_file_path, graphDB.py:155-174) — and IS [NOT] NULL, its
    # openCypher spelling (exists() on properties is deprecated there)
    ex = _EXISTS_RX.match(raw)
    if ex:
        if ex.group("var") not in binds:
            raise CypherError(f"unbound variable {ex.group('var')!r} in WHERE")
        return F.col(f"{binds[ex.group('var')]}__{ex.group('prop')}").isNotNull()
    nu = _IS_NULL_RX.match(raw)
    if nu:
        if nu.group("var") not in binds:
            raise CypherError(f"unbound variable {nu.group('var')!r} in WHERE")
        col = F.col(f"{binds[nu.group('var')]}__{nu.group('prop')}")
        return col.isNotNull() if nu.group("neg") else col.isNull()
    pm = plain and _PLAIN_PRED.match(raw)
    if pm and pm.group("name") in plain:
        return _apply_op(
            F.col(pm.group("name")),
            re.sub(r"\s+", " ", pm.group("op").upper()),
            _literal(pm.group("val")),
        )
    m = _PRED.match(raw)
    if not m:
        raise CypherError(f"cannot parse WHERE predicate: {raw.strip()!r}")
    var = m.group("var")
    if var not in binds:
        raise CypherError(f"unbound variable {var!r} in WHERE")
    col = F.col(f"{binds[var]}__{m.group('prop')}")
    op = re.sub(r"\s+", " ", m.group("op").upper())
    val_raw = m.group("val").strip()
    if plain and re.fullmatch(r"\w+", val_raw) and val_raw in plain:
        # RHS is a bare projected column (UNWIND variable / WITH alias):
        # compare column-to-column, e.g. `WHERE n.name = x` after UNWIND
        if op in ("STARTS WITH", "ENDS WITH", "CONTAINS", "=~", "IN"):
            raise CypherError(
                f"operator {op} does not accept a column RHS ({val_raw!r})"
            )
        return _apply_op(col, op, F.col(val_raw))
    return _apply_op(col, op, _literal(val_raw))


def _apply_op(col, op: str, val):
    if op == "=":
        return col == val
    if op in ("<>", "!="):
        return col != val
    if op == "<":
        return col < val
    if op == "<=":
        return col <= val
    if op == ">":
        return col > val
    if op == ">=":
        return col >= val
    if op == "=~":
        # openCypher: the regex must match the WHOLE string (Neo4j
        # semantics); Spark's rlike is a substring search, so anchor it
        return col.rlike("^(?:" + str(val) + ")$")
    if op == "STARTS WITH":
        return col.startswith(str(val))
    if op == "ENDS WITH":
        return col.endswith(str(val))
    if op == "CONTAINS":
        return col.contains(str(val))
    if op == "IN":
        if not isinstance(val, list):
            raise CypherError("IN needs a [list] literal")
        return col.isin(val)
    raise CypherError(f"unsupported operator {op!r}")  # pragma: no cover


def _compile_pattern(
    pattern: str,
    nodes: DataFrame,
    edges: DataFrame,
    outer_binds: dict[str, str],
    state: dict[str, int],
) -> tuple[DataFrame, dict[str, str], list[tuple[str, str]]]:
    """Compile one MATCH pattern (possibly comma-separated chains) into a
    DataFrame. Returns (df, local_binds, cross_pairs):

    - ``local_binds``: var → alias for this pattern's own columns;
    - ``cross_pairs``: (outer_alias, local_alias) for variables already
      bound by an EARLIER clause — the caller turns these into JOIN
      conditions (a post-filter would defeat an OPTIONAL left join).

    Intra-pattern re-bindings (same var twice in this pattern) are applied
    as equality filters here, as before."""
    local_binds: dict[str, str] = {}
    cross_pairs: list[tuple[str, str]] = []
    intra_eq: list[tuple[str, str]] = []
    df = None
    for chain_text in _split_chains(pattern):
        # connectivity for the cartesian guard means sharing a variable
        # bound BEFORE this chain (earlier chain or outer scope) — an
        # intra-chain cycle like (b)-[:R]->(b) re-binds its OWN variable
        # and must not exempt the chain from the product check
        prev_vars = set(local_binds)
        chain_linked = False
        pre_cross = len(cross_pairs)
        # p = shortestPath((a)-[:REL*..n]->(b)): compile the inner chain
        # with a DIST-carrying var-length expansion (min hops per pair —
        # min-dist is what Neo4j's one-shortest-path-per-pair projects to
        # for length(p)); the path variable binds to the dist column
        sp_pvar = None
        spm = _SHORTEST_RX.match(chain_text)
        if spm:
            sp_pvar = spm.group("pvar")
            chain_text = spm.group("inner")
        # plain path variable on a FIXED-length chain: p = (a)-[:R]->(b)
        # — nodes(p)/relationships(p)/length(p) project the statically
        # known alias sequence (node full_names / rel_type strings)
        plain_pvar = None
        if spm is None:
            pm = re.match(r"(?is)^\s*(?P<pvar>\w+)\s*=\s*(?P<inner>\(.*)\s*$",
                          chain_text)
            if pm:
                plain_pvar = pm.group("pvar")
                chain_text = pm.group("inner")
        chain_nodes: list[str] = []
        chain_rels: list[str] = []
        chain_has_varlen = False
        tokens = _parse_pattern(chain_text)
        if sp_pvar is not None and len(tokens) != 3:
            raise CypherError(
                "shortestPath supports exactly (a)-[:REL*lo..hi]->(b)"
            )
        chain_df = None
        prev_alias = None
        pending_edge: tuple[str, str] | None = None  # (ealias, end_col)
        for ttype, tok in tokens:
            if ttype == "node":
                alias = f"n{state['node_i']}"
                state["node_i"] += 1
                kind, ver = _parse_labels(tok.group("labels"))
                props = _parse_props(tok.group("props"))
                nd = _prefixed(_node_filter(nodes, kind, ver, props), alias)
                var = tok.group("var")
                if var:
                    if var in local_binds:
                        # same variable appearing again (within a chain or
                        # across comma-separated chains) means THE SAME
                        # node — enforced as an equality constraint below
                        intra_eq.append((local_binds[var], alias))
                        if var in prev_vars:
                            chain_linked = True
                    else:
                        local_binds[var] = alias
                        if var in outer_binds:
                            cross_pairs.append((outer_binds[var], alias))
                if chain_df is None:
                    chain_df = nd
                else:
                    ealias, end_col = pending_edge
                    chain_df = chain_df.join(
                        nd,
                        F.col(f"{ealias}__{end_col}") == F.col(f"{alias}__full_name"),
                    )
                prev_alias = alias
                chain_nodes.append(alias)
            else:
                rel = tok.group("rel")
                left, right = tok.group("left"), tok.group("right")
                if left and right:
                    raise CypherError(f"edge cannot point both ways: {tok.group(0)!r}")
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
                ealias = f"e{state['anon']}"
                state["anon"] += 1
                evar = tok.group("evar")
                if evar is not None:
                    undirected_hop = not left and not right
                    if lo_s is not None or hi_s is not None or "*" in tok.group(0):
                        raise CypherError(
                            "a relationship variable needs a single hop — a "
                            "var-length pattern has no one relationship to bind"
                        )
                    if undirected_hop:
                        raise CypherError(
                            "bind the relationship on a DIRECTED pattern — an "
                            "undirected hop dedupes to orientation-free pairs "
                            "and drops relationship properties"
                        )
                    if evar in local_binds or evar in outer_binds:
                        raise CypherError(
                            f"relationship variable {evar!r} is already bound"
                        )
                    local_binds[evar] = ealias
                    state.setdefault("edge_vars", set()).add(evar)
                chain_rels.append(rel)
                if not (lo == 1 and hi == 1):
                    chain_has_varlen = True
                eprops = _parse_props(tok.group("props"))
                if lo == 1 and hi == 1:
                    e = edges.filter(F.col("rel_type") == rel)
                    # edge property map — the reference writes edge params
                    # (association_type, myClient.py:187-194) and its C4
                    # helper filters on them (ast_manage.py:106-121)
                    for k, val in eprops.items():
                        e = e.filter(F.col(k) == val)
                else:
                    if eprops:
                        raise CypherError(
                            "edge properties are not supported on var-length hops"
                        )
                    # undirected expansion symmetrizes the BASE edge set
                    # inside _varlen_pairs (paths may mix orientations)
                    e = _varlen_pairs(
                        edges,
                        rel,
                        lo,
                        hi,
                        undirected=not left and not right,
                        with_dist=sp_pvar is not None,
                    )
                    if sp_pvar is not None:
                        state.setdefault("paths", {})[sp_pvar] = f"{ealias}__dist"
                        sp_pvar = None  # consumed by this var-length hop
                if (lo, hi) == (1, 1) and not left and not right:
                    # undirected single hop: symmetrize the (src, dst) pair
                    # set, then treat as forward — matches the edge in
                    # either orientation
                    p = e.select("src", "dst")
                    e = p.unionByName(
                        p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
                    ).dropDuplicates()
                start_col, end_col = ("dst", "src") if left else ("src", "dst")
                chain_df = chain_df.join(
                    _prefixed(e, ealias),
                    F.col(f"{prev_alias}__full_name") == F.col(f"{ealias}__{start_col}"),
                )
                pending_edge = (ealias, end_col)
        if sp_pvar is not None:
            raise CypherError(
                "shortestPath requires a var-length relationship, "
                "e.g. [:INHERITS*] or [:CALL*1..5]"
            )
        if plain_pvar is not None:
            if chain_has_varlen:
                raise CypherError(
                    "path variables on var-length chains are only supported "
                    "via shortestPath() (a var-length hop has no single "
                    "statically-known node sequence)"
                )
            state.setdefault("fixed_paths", {})[plain_pvar] = {
                "nodes": list(chain_nodes),
                "rels": list(chain_rels),
            }
        # comma-separated chains combine by product; Catalyst rewrites the
        # product into an equi-join when shared-variable equality (below)
        # or carried-scope joins connect them. A chain that shares NO
        # variable with any earlier chain or the outer scope plans a true
        # N×M cartesian product — refuse loudly (the refuse-loudly stance
        # MAX_VARLEN_HOPS takes; Neo4j merely warns) unless the caller
        # opted in via allow_cartesian. WHERE-connected products
        # (`MATCH (a),(b) WHERE a.x=b.y`) also need the opt-in: the WHERE
        # is not visible at pattern-compile time.
        if df is not None:
            connected = chain_linked or len(cross_pairs) > pre_cross
            if not connected and not state.get("allow_cartesian"):
                raise CypherError(
                    f"disconnected MATCH chain {chain_text.strip()!r} would plan "
                    "a cartesian product; share a variable with an earlier "
                    "chain, or opt in with run_cypher(..., allow_cartesian=True)"
                )
        df = chain_df if df is None else df.crossJoin(chain_df)
    for a, b in intra_eq:
        df = df.filter(F.col(f"{a}__full_name") == F.col(f"{b}__full_name"))
    return df, local_binds, cross_pairs


_RETURN_RX = re.compile(
    r"^(?P<head>.*?)\bRETURN\b"
    r"(?P<distinct>\s+DISTINCT\b)?(?P<items>.*?)"
    r"(?:\bORDER\s+BY\b(?P<order>.*?))?(?:\bSKIP\b\s*(?P<skip>\d+))?"
    r"\s*(?:\bLIMIT\b\s*(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_where(segment: str) -> tuple[str, str | None]:
    mm = re.search(r"\bWHERE\b", segment, re.IGNORECASE)
    if mm:
        return segment[: mm.start()], segment[mm.end():]
    return segment, None


_PATTERN_PRED_RX = re.compile(r"(?is)^\s*(?P<neg>NOT\s+)?(?P<pat>\(.*\))\s*$")
_EXISTS_SUB_RX = re.compile(
    r"(?is)^\s*(?P<neg>NOT\s+)?EXISTS\s*\{(?P<body>.*)\}\s*$"
)


def _as_pattern_pred(text: str) -> tuple[bool, str] | None:
    """(negated, pattern) if ``text`` is a WHERE pattern predicate like
    ``(c)-[:HAS_METHOD]->(m:METHOD)`` or ``NOT (c)-[:INHERITS]->()``,
    else None. Requires at least one relationship (a ``)`` followed by an
    edge connector) so parenthesized boolean terms are never mistaken."""
    m = _PATTERN_PRED_RX.match(text)
    if not m:
        return None
    pat = m.group("pat")
    if not re.search(r"\)\s*(<-|-)", pat):
        return None
    return bool(m.group("neg")), pat


def _apply_where(
    df: DataFrame,
    where: str,
    binds: dict[str, str],
    plain: set[str] | None,
    nodes: DataFrame,
    edges: DataFrame,
    state: dict[str, int],
) -> DataFrame:
    """Apply a WHERE clause to a compiled pattern frame. Plain boolean
    terms go through ``_where_condition`` as one filter; top-level AND
    conjuncts that are PATTERN PREDICATES (Neo4j's existential sugar,
    ``WHERE (c)-[:R]->(x)`` / ``WHERE NOT ...``) compile the inner pattern
    and become a LEFT SEMI (anti, when negated) join on the shared bound
    variables — existence is decided per outer row, variables inside the
    predicate are NOT exported (openCypher scoping). Pattern predicates
    under OR or inside nested parens are refused loudly by the plain-term
    parser (the semi-join cannot be disjoined with a column filter)."""
    plain_terms: list[str] = []
    for term in _split_bool(where, "AND"):
        if not term.strip():
            continue
        inner_where: str | None = None
        pp = _as_pattern_pred(term)
        if pp is not None:
            neg, pat = pp
        else:
            # EXISTS { [MATCH] pattern [WHERE inner] } — the modern
            # openCypher spelling of the same existential; the inner WHERE
            # filters the subquery pattern before the semi/anti join and
            # may reference only variables the inner pattern binds
            es = _EXISTS_SUB_RX.match(term)
            if es is None:
                plain_terms.append(term.strip())
                continue
            neg = bool(es.group("neg"))
            body = re.sub(r"(?is)^\s*MATCH\b", "", es.group("body").strip(), count=1)
            pat, inner_where = _split_where(body)
        if len(_split_chains(pat)) != 1:
            raise CypherError(
                f"a pattern predicate must be a single chain: {pat!r}"
            )
        pdf, p_binds, p_cross = _compile_pattern(pat, nodes, edges, binds, state)
        if inner_where:
            pdf = pdf.filter(_where_condition(inner_where, p_binds))
        if not p_cross:
            raise CypherError(
                "a pattern predicate must reference at least one bound "
                f"variable: {pat!r}"
            )
        cond = None
        for outer_a, inner_a in p_cross:
            c = F.col(f"{outer_a}__full_name") == F.col(f"{inner_a}__full_name")
            cond = c if cond is None else (cond & c)
        df = df.join(pdf, cond, "left_anti" if neg else "left_semi")
    if plain_terms:
        df = df.filter(_where_condition(" AND ".join(plain_terms), binds, plain))
    return df


def _compile_chain(
    head: str,
    nodes: DataFrame,
    edges: DataFrame,
    binds: dict[str, str],
    state: dict[str, int],
    df: DataFrame | None = None,
    plain: set[str] | None = None,
    carried_product: bool = False,
):
    """Compile a ``MATCH p [WHERE w] (OPTIONAL MATCH p_i [WHERE w_i])*``
    clause chain. With a carried ``df`` (post-WITH), the first MATCH inner-
    joins on its shared variables; per Cypher, a WHERE after an OPTIONAL
    MATCH filters THAT pattern before the left join. ``carried_product``
    marks a carried frame with NO pattern variables (an UNWIND literal
    row set): the MATCH combines with it by product — per Cypher, UNWIND
    multiplies the incoming rows — which is safe because the unwound side
    is a bounded literal list, never a table."""
    segments = re.split(r"\bOPTIONAL\s+MATCH\b", head, flags=re.IGNORECASE)
    head_m = re.match(r"^\s*MATCH\b(?P<rest>.*)$", segments[0], re.IGNORECASE | re.DOTALL)
    if not head_m:
        raise CypherError("expected MATCH clause")

    pattern, where = _split_where(head_m.group("rest"))
    mdf, local_binds, cross = _compile_pattern(pattern, nodes, edges, binds, state)
    if df is None:
        df = mdf
    elif not cross and carried_product:
        # UNWIND rows × pattern rows (Cypher row-multiplication semantics)
        df = df.crossJoin(mdf)
    else:
        # MATCH after WITH: inner join on the variables shared with the
        # carried scope (requiring one keeps products explicit)
        if not cross:
            raise CypherError(
                "MATCH after WITH must share at least one variable with the "
                "carried scope"
            )
        cond = None
        for outer_a, inner_a in cross:
            c = F.col(f"{outer_a}__full_name") == F.col(f"{inner_a}__full_name")
            cond = c if cond is None else (cond & c)
        df = df.join(mdf, cond, "inner")
    for var, alias in local_binds.items():
        binds.setdefault(var, alias)
    if where:
        # WHERE sees the full scope: pattern variables plus any bare
        # columns a preceding WITH projected (Cypher scoping); pattern
        # predicates become semi/anti joins
        df = _apply_where(df, where, binds, plain, nodes, edges, state)

    for seg in segments[1:]:
        opt_pattern, opt_where = _split_where(seg)
        odf, opt_binds, ocross = _compile_pattern(
            opt_pattern, nodes, edges, binds, state
        )
        if not ocross:
            raise CypherError(
                "OPTIONAL MATCH must share at least one variable with an "
                "earlier clause"
            )
        if opt_where:
            # pre-join filter, scoped to the optional pattern's own columns
            odf = _apply_where(odf, opt_where, opt_binds, None, nodes, edges, state)
        cond = None
        for outer_a, inner_a in ocross:
            c = F.col(f"{outer_a}__full_name") == F.col(f"{inner_a}__full_name")
            cond = c if cond is None else (cond & c)
        df = df.join(odf, cond, "left")
        for var, alias in opt_binds.items():
            binds.setdefault(var, alias)
    return df


def _string_spans(text: str) -> list[tuple[int, int]]:
    """Spans of quoted string literals, tracked with a real scanner (a '
    inside a "..." literal must not poison quote state, and vice versa)."""
    spans, i, n = [], 0, len(text)
    while i < n:
        ch = text[i]
        if ch in "'\"":
            j = text.find(ch, i + 1)
            if j == -1:
                spans.append((i, n))
                break
            spans.append((i, j + 1))
            i = j + 1
        else:
            i += 1
    return spans


def _split_on_with(head: str) -> list[str]:
    """Split a query head on top-level WITH keywords (never the WITH of
    STARTS WITH / ENDS WITH, never inside a string literal)."""
    spans = _string_spans(head)
    parts, last = [], 0
    for mm in re.finditer(r"\bWITH\b", head, re.IGNORECASE):
        if re.search(r"(?i)\b(?:STARTS|ENDS)\s*$", head[: mm.start()]):
            continue
        if any(a <= mm.start() < b for a, b in spans):
            continue
        parts.append(head[last : mm.start()])
        last = mm.end()
    parts.append(head[last:])
    return parts


def _apply_with(
    df: DataFrame,
    clause: str,
    nodes: DataFrame,
    edges: DataFrame,
    binds: dict[str, str],
    plain: set[str],
    state: dict[str, int],
):
    """One ``WITH items [WHERE having] [MATCH ...]`` stage: project/aggregate
    the carried scope down to the listed items (bare variables carry their
    whole column set; aggregates trigger implicit grouping), apply the
    post-projection WHERE (HAVING semantics), then compile any following
    MATCH chain against the narrowed scope."""
    mm = re.search(r"\b(?:OPTIONAL\s+)?MATCH\b", clause, re.IGNORECASE)
    with_text, rest = (clause[: mm.start()], clause[mm.start():]) if mm else (clause, "")
    items_text, having = _split_where(with_text)

    # WITH-level pagination sub-clauses (Neo4j: ORDER BY / SKIP / LIMIT
    # apply to the WITH projection, BEFORE a following WHERE filters it).
    # SKIP/LIMIT without ORDER BY is refused — an unordered cut is
    # nondeterministic under any shuffle, the refuse-loudly policy.
    order_s, skip_n, limit_n = None, None, None
    m_ol = re.search(
        r"(?is)\bORDER\s+BY\s+(?P<order>.*?)"
        r"(?P<tail>(?:\s+SKIP\s+\d+)?(?:\s+LIMIT\s+\d+)?)\s*$",
        items_text,
    )
    if m_ol:
        order_s = m_ol.group("order")
        tail = m_ol.group("tail") or ""
        items_text = items_text[: m_ol.start()]
        ms = re.search(r"(?i)SKIP\s+(\d+)", tail)
        skip_n = int(ms.group(1)) if ms else None
        ml = re.search(r"(?i)LIMIT\s+(\d+)", tail)
        limit_n = int(ml.group(1)) if ml else None
    elif re.search(r"(?is)\b(?:SKIP|LIMIT)\s+\d+\s*$", items_text):
        raise CypherError(
            "SKIP/LIMIT inside WITH requires ORDER BY — an unordered cut "
            "is nondeterministic"
        )

    distinct_with = False
    dm = re.match(r"(?is)^\s*DISTINCT\s+(?P<rest>.*)$", items_text)
    if dm:
        distinct_with = True
        items_text = dm.group("rest")

    carried: list[str] = []  # prefixes of bare-carried variables
    new_binds: dict[str, str] = {}
    plain_items: list = []  # non-aggregate projected columns
    new_plain: set[str] = set()
    aggs: list = []
    for raw_item in _split_items(items_text):
        it = _ITEM.match(raw_item)
        if not it:
            raise CypherError(f"cannot parse WITH item: {raw_item!r}")
        alias = it.group("alias")
        func = (it.group("func") or "").lower()
        if func in ("count", "collect", "min", "max", "sum", "avg"):
            agg_col, agg_name = _agg_expr(func, it.group("farg"), alias, binds, plain)
            aggs.append(agg_col)
            new_plain.add(agg_name)
        elif func == "labels":
            var = it.group("farg")
            if var not in binds:
                raise CypherError(f"unbound variable {var!r}")
            name = alias or f"labels_{var}"
            plain_items.append(_labels_col(binds[var]).alias(name))
            new_plain.add(name)
        else:
            var, prop = it.group("var"), it.group("prop")
            if prop is None and var in binds:
                # bare node variable (optionally re-aliased: WITH c AS x)
                # stays a NODE binding — full column set carried
                carried.append(binds[var])
                new_binds[alias or var] = binds[var]
            elif prop is None and var in plain:
                name = alias or var
                plain_items.append(F.col(var).alias(name))
                new_plain.add(name)
            else:
                if var not in binds:
                    raise CypherError(f"unbound variable {var!r}")
                name = alias or f"{var}_{prop or 'full_name'}"
                plain_items.append(
                    F.col(f"{binds[var]}__{prop or 'full_name'}").alias(name)
                )
                new_plain.add(name)

    carried_cols = [
        F.col(c) for p in carried for c in df.columns if c.startswith(f"{p}__")
    ]
    if aggs:
        # implicit grouping: every carried column is functionally dependent
        # on the variable's identity, so grouping by the full prefix set
        # preserves var.prop access downstream without a re-join
        df = df.groupBy(*carried_cols, *plain_items).agg(*aggs)
        if distinct_with:
            # openCypher accepts DISTINCT alongside aggregates: it applies
            # to the RESULT rows, post-aggregation (per-input dedup is the
            # separate agg(DISTINCT x) form). Under implicit grouping every
            # output row is already unique on its grouping keys, so this
            # dedup is a provable no-op — accepted for syntax parity
            # instead of the r5 refusal, and kept literal (one dedup over
            # the already-aggregated, group-count-sized frame) rather than
            # silently elided.
            df = df.dropDuplicates()
    else:
        df = df.select(*carried_cols, *plain_items)
        if distinct_with:
            df = df.dropDuplicates()
    if order_s is not None:
        order_cols = []
        for raw in order_s.split(","):
            om = _ORDER_ITEM.match(raw)
            if not om:
                raise CypherError(f"cannot parse WITH ORDER BY item: {raw.strip()!r}")
            var, prop = om.group("var"), om.group("prop")
            if prop is None and var in df.columns:
                name = var
            elif prop is not None and var in new_binds:
                name = f"{new_binds[var]}__{prop}"
            else:
                raise CypherError(
                    f"WITH ORDER BY {raw.strip()!r} must reference a "
                    "projected column or carried variable property"
                )
            c = F.col(name)
            if om.group("dir") and om.group("dir").upper() == "DESC":
                c = c.desc()
            order_cols.append(c)
        df = df.orderBy(*order_cols)
        if skip_n:
            df = df.offset(skip_n)
        if limit_n is not None:
            df = df.limit(limit_n)
    if having:
        df = df.filter(_where_condition(having, new_binds, new_plain))
    binds.clear()
    binds.update(new_binds)
    if rest:
        df = _compile_chain(rest, nodes, edges, binds, state, df, new_plain)
    return df, new_plain


def _agg_expr(func: str, arg: str, alias: str | None, binds, plain):
    """Aggregate RETURN/WITH item → (Spark aggregate Column, output name)."""
    if arg == "*":
        if func != "count":
            raise CypherError(f"{func}(*) is not valid Cypher")
        name = alias or "count"
        return F.count(F.lit(1)).alias(name), name
    dm = re.match(r"(?is)^DISTINCT\s+(?P<rest>.*)$", arg)
    distinct = dm is not None
    if dm:
        arg = dm.group("rest").strip()
    v, _, pr = arg.partition(".")
    if not pr and v in plain:
        col_name = v
    elif v in binds:
        col_name = f"{binds[v]}__{pr or 'full_name'}"
    else:
        raise CypherError(f"unbound variable {v!r}")
    c = F.col(col_name)
    if func == "count":
        # Cypher count(x): non-null rows only; count(DISTINCT x) dedupes
        agg = F.count_distinct(c) if distinct else F.count(c)
    elif func == "min":
        agg = F.min(c)  # DISTINCT is a no-op for min/max
    elif func == "max":
        agg = F.max(c)
    elif func in ("sum", "avg"):
        # Cypher sum/avg: numeric properties only — a non-numeric column
        # surfaces Spark's analysis error (type mismatch), which is the
        # loud failure we want; DISTINCT dedupes before aggregating.
        if func == "sum":
            agg = F.sum_distinct(c) if distinct else F.sum(c)
        else:
            # avg(DISTINCT x): dedupe before averaging. PySpark has no
            # avg_distinct builtin — the SQL expression form compiles to
            # the same hash-aggregate with a distinct pre-pass Catalyst
            # plans for count_distinct (partial dedup map-side, no extra
            # shuffle beyond the grouping exchange).
            agg = (
                F.expr(f"avg(DISTINCT `{col_name}`)")
                if distinct
                else F.avg(c)  # int sum / count — exactly-rounded division
            )
    else:
        # Cypher collect() has no defined order — sort for a
        # deterministic, engine-stable result
        agg = (
            F.sort_array(F.collect_set(c))
            if distinct
            else F.sort_array(F.collect_list(c))
        )
    name = alias or (
        f"{func}_{'distinct_' if distinct else ''}{arg.replace('.', '_')}"
    )
    return agg.alias(name), name


_CASE_RX = re.compile(
    r"(?is)^\s*CASE\s+(?P<body>.+)\bEND\s*(?:\s*AS\s+(?P<alias>\w+))?\s*$"
)


def _value_col(raw: str, binds, plain):
    """A CASE branch value: var.prop, a WITH/UNWIND bare column, or a
    literal (string/int/$param)."""
    raw = raw.strip()
    vm = re.fullmatch(r"(?P<var>\w+)\.(?P<prop>\w+)", raw)
    if vm:
        var = vm.group("var")
        if var not in binds:
            raise CypherError(f"unbound variable {var!r} in CASE")
        return F.col(f"{binds[var]}__{vm.group('prop')}")
    if plain and re.fullmatch(r"\w+", raw) and raw in plain:
        return F.col(raw)
    return F.lit(_literal(raw))


def _case_col(raw_item: str, binds, plain):
    """Searched-CASE RETURN item → aliased Column, or None if the item is
    not a CASE expression. Searched form ``CASE WHEN cond THEN val ...
    [ELSE val] END [AS alias]`` — conditions reuse the full WHERE boolean
    grammar; simple form ``CASE test WHEN val THEN ... END`` — each arm an
    equality against the leading comparand (openCypher). Values are
    properties/bare columns/literals."""
    cm = _CASE_RX.match(raw_item)
    if cm is None:
        return None
    parts = _split_bool(cm.group("body"), "WHEN")
    # simple form `CASE test WHEN val THEN ...`: the leading expression is
    # the comparand, each WHEN arm an equality against it (openCypher);
    # empty leading text = searched form, arms are full boolean conditions
    test_col = (
        _value_col(parts[0], binds, plain) if parts[0].strip() else None
    )
    if len(parts) < 2:
        raise CypherError("CASE needs at least one WHEN arm")
    branches: list[tuple] = []
    else_col = None
    n = len(parts) - 1
    for j, part in enumerate(parts[1:]):
        th = _split_bool(part, "THEN")
        if len(th) != 2:
            raise CypherError(f"cannot parse CASE branch: {part.strip()!r}")
        cond_s, val_s = th
        if j == n - 1:
            ev = _split_bool(val_s, "ELSE")
            if len(ev) == 2:
                val_s, else_s = ev
                else_col = _value_col(else_s, binds, plain)
            elif len(ev) > 2:
                raise CypherError("CASE has more than one ELSE")
        if test_col is not None:
            cond = test_col == _value_col(cond_s, binds, plain)
        else:
            cond = _where_condition(cond_s, binds, plain)
        branches.append((cond, _value_col(val_s, binds, plain)))
    col = None
    for cond, val in branches:
        col = F.when(cond, val) if col is None else col.when(cond, val)
    if else_col is not None:
        col = col.otherwise(else_col)  # absent ELSE → NULL, per Cypher
    return col.alias(cm.group("alias") or "case")


_SCALAR_FNS = ("coalesce", "size", "toupper", "tolower", "substring",
               "replace", "trim")
_SCALAR_FN_RX = re.compile(
    r"(?is)^\s*(?P<fn>" + "|".join(_SCALAR_FNS) + r")\s*\((?P<args>.*)\)"
    r"\s*(?:AS\s+(?P<alias>\w+))?\s*$"
)


def _scalar_fn_col(raw_item: str, binds, plain, df):
    """Scalar-function RETURN item → aliased Column, or None if the item
    is not one. openCypher string/list scalars: ``coalesce(a, b, ...)``,
    ``size(x)`` (list length on array properties, character length on
    strings — resolved from the column's actual type), ``toUpper(s)`` /
    ``toLower(s)`` / ``trim(s)``, ``substring(s, start[, len])``
    (0-based start per Cypher), ``replace(s, search, repl)`` (literal,
    not regex). Arguments are var.prop / WITH-UNWIND bare columns /
    literals — not nested calls (documented bound; the spark.sql escape
    hatch covers arbitrary expression trees)."""
    fm = _SCALAR_FN_RX.match(raw_item)
    if fm is None:
        return None
    fn = fm.group("fn").lower()
    raw_args = [a for a in _split_items(fm.group("args")) if a.strip()]
    if not raw_args:
        raise CypherError(f"{fn}() needs at least one argument")

    first = raw_args[0].strip()
    vm = re.fullmatch(r"(?P<var>\w+)\.(?P<prop>\w+)", first)
    default_alias = (
        f"{fn}_{vm.group('var')}_{vm.group('prop')}" if vm else fn
    )
    alias = fm.group("alias") or default_alias

    if fn == "coalesce":
        cols = [_value_col(a, binds, plain) for a in raw_args]
        return F.coalesce(*cols).alias(alias)
    col = _value_col(first, binds, plain)
    if fn == "size":
        if len(raw_args) != 1:
            raise CypherError("size() takes exactly one argument")
        # list vs string size from the bound column's real type
        from pyspark.sql.types import ArrayType

        name = None
        if vm and vm.group("var") in binds:
            name = f"{binds[vm.group('var')]}__{vm.group('prop')}"
        elif first in plain:
            name = first
        is_array = name is not None and isinstance(
            df.schema[name].dataType, ArrayType
        )
        sized = F.size(col) if is_array else F.length(col)
        return sized.cast("int").alias(alias)
    if fn in ("toupper", "tolower", "trim"):
        if len(raw_args) != 1:
            raise CypherError(f"{fn}() takes exactly one argument")
        return {
            "toupper": F.upper, "tolower": F.lower, "trim": F.trim
        }[fn](col).alias(alias)
    if fn == "substring":
        if len(raw_args) not in (2, 3):
            raise CypherError("substring() takes (s, start[, length])")
        start = _literal(raw_args[1])
        if not isinstance(start, int) or start < 0:
            raise CypherError("substring() start must be a non-negative int")
        if len(raw_args) == 3:
            length = _literal(raw_args[2])
            if not isinstance(length, int) or length < 0:
                raise CypherError("substring() length must be a non-negative int")
        else:
            length = 2_147_483_647 - (start + 1)  # to end of string
        # Cypher substring is 0-based; Spark's is 1-based
        return F.substring(col, start + 1, length).alias(alias)
    if fn == "replace":
        if len(raw_args) != 3:
            raise CypherError("replace() takes (s, search, replacement)")
        search = _literal(raw_args[1])
        repl = _literal(raw_args[2])
        if not isinstance(search, str) or not isinstance(repl, str):
            raise CypherError("replace() search/replacement must be strings")
        return F.replace(col, F.lit(search), F.lit(repl)).alias(alias)
    raise CypherError(f"unsupported scalar function {fn!r}")  # unreachable


def run_cypher(
    cypher: str,
    nodes: DataFrame,
    edges: DataFrame,
    allow_cartesian: bool = False,
    params: dict[str, object] | None = None,
) -> DataFrame:
    """Compile + run a Cypher-subset query against (nodes, edges).

    Grammar: ``MATCH p [WHERE w] (OPTIONAL MATCH p_i [WHERE w_i])*
    (WITH items [WHERE having] [MATCH ...])*
    RETURN [DISTINCT] items [ORDER BY ...] [SKIP n] [LIMIT n]``. Per
    Cypher semantics, a WHERE following an OPTIONAL MATCH filters THAT
    optional pattern before the left join; a WHERE after WITH filters the
    projected/aggregated scope (HAVING); unmatched optional rows surface
    as NULLs.

    Disconnected MATCH chains (``MATCH (a), (b)`` with no shared
    variable) raise CypherError unless ``allow_cartesian=True`` — a typo
    there silently plans an N² join at scale, so the product is opt-in.

    ``params`` supplies query parameters (``$name`` in property maps and
    WHERE values — Neo4j's parameter surface): str/int/list values only,
    resolved at compile time; a missing or unusable parameter raises."""
    _PARAMS.d = params or {}
    try:
        if re.match(r"(?is)^\s*CALL\b", cypher):
            return _run_call(cypher, nodes, edges)
        return _run_cypher_inner(cypher, nodes, edges, allow_cartesian)
    finally:
        _PARAMS.d = None


# CALL procedures: the db.* catalog family Neo4j clients probe a database
# with (the reference delegates these to Neo4j wholesale, graphDB.py:
# 106-112). Each returns ONE canonical column, ascending by default for
# engine-stable output. Any other CALL form (user procedures, CALL {}
# subqueries) refuses loudly below.
_CALL_RX = re.compile(
    r"(?is)^\s*CALL\s+db\.(?P<proc>labels|relationshipTypes|propertyKeys)"
    r"\s*\(\s*\)\s*"
    r"(?:YIELD\s+(?P<ycol>\w+)(?:\s+AS\s+(?P<yalias>\w+))?\s*"
    r"(?:RETURN\s+(?P<rcol>\w+)\s*"
    r"(?:ORDER\s+BY\s+(?P<ocol>\w+)(?P<desc>\s+DESC)?\s*)?"
    r"(?:LIMIT\s+(?P<limit>\d+))?\s*)?)?$"
)
_CALL_COL = {
    "labels": "label",
    "relationshipTypes": "relationshipType",
    "propertyKeys": "propertyKey",
}
# schema-defined property keys, reported only when ≥1 entity carries a
# value (kind/versions are structural labels, not properties — they
# surface through labels()/version labels instead, matching labels(x))
_NODE_PROP_KEYS = [
    "full_name", "name", "file_path", "class", "signature", "code_file",
    "code_start", "code_end",
]


def _run_call(cypher: str, nodes: DataFrame, edges: DataFrame) -> DataFrame:
    m = _CALL_RX.fullmatch(cypher)
    if not m:
        raise CypherError(
            "unsupported CALL — procedures db.labels() / "
            "db.relationshipTypes() / db.propertyKeys() with an optional "
            "'YIELD col [AS alias] [RETURN col [ORDER BY col [DESC]] "
            "[LIMIT n]]' tail are the supported forms"
        )
    proc = m.group("proc")
    # normalize the camel-case proc name the regex matched case-insensitively
    proc = {p.lower(): p for p in _CALL_COL}[proc.lower()]
    canonical = _CALL_COL[proc]
    if proc == "labels":
        # same label set labels(x) reports per node: kind + version tags
        df = nodes.select(
            F.explode(
                F.concat(F.array(F.col("kind")), F.col("versions"))
            ).alias(canonical)
        ).distinct()
    elif proc == "relationshipTypes":
        df = edges.select(F.col("rel_type").alias(canonical)).distinct()
    else:
        # LAZY key-presence computation (ADVICE r5): the old form ran two
        # eager collect() jobs inside run_cypher and materialized the key
        # list driver-side — callers composing the returned DataFrame
        # would re-execute stale driver-computed values instead of
        # reflecting the current graph. One map-side-combinable aggregate
        # row per side, exploded and filtered, keeps the result a lazy
        # plan like every other run_cypher path; the key universe is the
        # fixed schema (bounded), so the exploded array is tiny.
        node_keys = (
            nodes.agg(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("k"),
                            F.count(F.col(f"`{c}`")).alias("n"),
                        )
                        for c in _NODE_PROP_KEYS
                    ]
                ).alias("a")
            )
            .select(F.explode("a").alias("s"))
            .filter(F.col("s.n") > 0)
            .select(F.col("s.k").alias(canonical))
        )
        edge_key = (
            edges.agg(F.count("association_type").alias("n"))
            .filter(F.col("n") > 0)
            .select(F.lit("association_type").alias(canonical))
        )
        df = node_keys.unionByName(edge_key)
    out_name = canonical
    if m.group("ycol"):
        if m.group("ycol") != canonical:
            raise CypherError(
                f"db.{proc}() yields {canonical!r}, not {m.group('ycol')!r}"
            )
        if m.group("yalias"):
            out_name = m.group("yalias")
            df = df.withColumnRenamed(canonical, out_name)
        if m.group("rcol") and m.group("rcol") != out_name:
            raise CypherError(f"unbound variable {m.group('rcol')!r} in RETURN")
        if m.group("ocol") and m.group("ocol") != out_name:
            raise CypherError(
                f"unbound variable {m.group('ocol')!r} in ORDER BY"
            )
    df = df.orderBy(F.desc(out_name) if m.group("desc") else F.asc(out_name))
    if m.group("limit"):
        df = df.limit(int(m.group("limit")))
    return df


_CLAUSE_AFTER_UNION = re.compile(
    r"(?is)\s*(MATCH|OPTIONAL\s+MATCH|UNWIND|WITH|RETURN|CALL|MERGE|CREATE)\b"
)


def _split_top_union(text: str) -> tuple[list[str], bool] | None:
    """Top-level UNION [ALL] split (never inside a string literal).
    Returns (branches, is_all) or None when there is no union. Mixing
    UNION and UNION ALL is refused like openCypher does.

    ``union`` is a legal identifier ("MATCH (union:CLASS) RETURN
    union.name"), so a token only counts as the set operator when it is
    (a) outside every paren/bracket/brace — never inside a node or
    relationship pattern, map, or function call — and (b) followed by a
    clause keyword starting the next branch; a variable use is instead
    followed by '.', ',', an operator, AS, or end of query."""
    spans = _string_spans(text)
    # bracket depth per position, string contents ignored
    depth = [0] * (len(text) + 1)
    d = 0
    for i, ch in enumerate(text):
        if any(a <= i < b for a, b in spans):
            depth[i] = d
            continue
        if ch in "([{":
            d += 1
        elif ch in ")]}":
            d = max(0, d - 1)
        depth[i] = d
    hits = []
    for m in re.finditer(r"(?is)\bUNION(\s+ALL)?\b", text):
        if any(a <= m.start() < b for a, b in spans):
            continue
        if depth[m.start()] > 0:
            continue  # inside a pattern/map/call: identifier, not operator
        if not _CLAUSE_AFTER_UNION.match(text, m.end()):
            continue  # no new branch follows: 'union' used as a variable
        hits.append((m.start(), m.end(), bool(m.group(1))))
    if not hits:
        return None
    kinds = {h[2] for h in hits}
    if len(kinds) > 1:
        raise CypherError("mixing UNION and UNION ALL in one query is not supported")
    parts, prev = [], 0
    for s, e, _ in hits:
        parts.append(text[prev:s])
        prev = e
    parts.append(text[prev:])
    return parts, kinds.pop()


def _run_cypher_inner(
    cypher: str,
    nodes: DataFrame,
    edges: DataFrame,
    allow_cartesian: bool,
) -> DataFrame:
    text = cypher.strip()
    # UNION / UNION ALL: compile each branch independently, require the
    # same RETURN column names (openCypher), align by name; plain UNION
    # dedups the combined rows
    union = _split_top_union(text)
    if union:
        branches, is_all = union
        dfs = [
            _run_cypher_inner(b, nodes, edges, allow_cartesian) for b in branches
        ]
        cols0 = dfs[0].columns
        for df in dfs[1:]:
            if df.columns != cols0:
                raise CypherError(
                    "UNION branches must return the same column names "
                    f"(got {cols0} vs {df.columns})"
                )
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out if is_all else out.dropDuplicates()
    # leading UNWIND clauses: a bounded literal (or $param) list becomes a
    # row set whose column is usable as a bare name in WHERE/RETURN; per
    # Cypher, a following MATCH multiplies rows against it
    udf: DataFrame | None = None
    unwind_plain: set[str] = set()
    while True:
        mu = re.match(
            r"(?is)^\s*UNWIND\s+(?P<expr>\[[^\]]*\]|\$\w+)\s+AS\s+(?P<var>\w+)\s+"
            r"(?P<rest>.*)$",
            text,
        )
        if not mu:
            break
        values = _literal(mu.group("expr"))
        if not isinstance(values, list):
            raise CypherError("UNWIND needs a [list] literal or a $param list")
        # openCypher: UNWIND of an empty list yields ZERO rows (not an
        # error) — the element type is unknowable but also irrelevant,
        # since every downstream row multiplies against nothing
        head_is_str = isinstance(values[0], str) if values else True
        if not all(isinstance(v, str) == head_is_str for v in values):
            raise CypherError("UNWIND list items must be all-string or all-int")
        var = mu.group("var")
        # pandas input → JVM LocalTableScan (closure.py precedent): a
        # plain-list createDataFrame plans a pickled-Python-RDD scan and
        # the FIRST such call in a session pays the whole Python-RDD
        # bring-up (~1.6s measured inside g_cypher_unwind_params' cold
        # timer, 4.97x its pinned median)
        import pandas as pd

        schema = f"{var} {'string' if head_is_str else 'bigint'}"
        vdf = (
            nodes.sparkSession.createDataFrame(
                pd.DataFrame({var: list(values)}), schema
            )
            if values
            # empty list: zero rows — dtype-less pandas would leave the
            # Arrow cast ambiguous, the plain path is exact (and cheap: no
            # data crosses)
            else nodes.sparkSession.createDataFrame([], schema)
        )
        udf = vdf if udf is None else udf.crossJoin(vdf)
        unwind_plain.add(var)
        text = mu.group("rest")
    m = _RETURN_RX.match(text)
    if not m:
        raise CypherError(
            "only MATCH ... [WHERE ...] [OPTIONAL MATCH ... [WHERE ...]]* "
            "[WITH ... [WHERE ...] [MATCH ...]]* "
            "RETURN [DISTINCT] ... [ORDER BY ...] [SKIP n] [LIMIT n] is supported"
        )
    head = m.group("head")
    # trailing property UNWINDs (`MATCH (n) UNWIND n.versions AS v`):
    # an array PROPERTY explodes per Cypher row-multiplication — peeled
    # off the head back-to-front and applied as explode() after the
    # pattern compiles (the leading-UNWIND literal form is handled above)
    prop_unwinds: list[tuple[str, str, str]] = []
    while True:
        pu = re.search(
            r"(?is)\bUNWIND\s+(?P<var>\w+)\.(?P<prop>\w+)\s+AS\s+(?P<out>\w+)\s*$",
            head,
        )
        if not pu:
            break
        prop_unwinds.append((pu.group("var"), pu.group("prop"), pu.group("out")))
        head = head[: pu.start()]
    prop_unwinds.reverse()
    with_parts = _split_on_with(head)

    state = {"node_i": 0, "anon": 0, "allow_cartesian": allow_cartesian}
    binds: dict[str, str] = {}  # var -> dataframe alias (first binding wins)
    # bare columns introduced by WITH aliases or UNWIND
    plain: set[str] = set(unwind_plain)

    if udf is not None and not with_parts[0].strip():
        # pure UNWIND ... RETURN — no pattern at all
        df = udf
    else:
        df = _compile_chain(
            with_parts[0],
            nodes,
            edges,
            binds,
            state,
            udf,
            plain,
            carried_product=udf is not None,
        )
    for wp in with_parts[1:]:
        df, plain = _apply_with(df, wp, nodes, edges, binds, plain, state)
    for uvar, uprop, uout in prop_unwinds:
        if uvar not in binds:
            raise CypherError(f"UNWIND: unbound variable {uvar!r}")
        src_col = f"{binds[uvar]}__{uprop}"
        if src_col not in df.columns:
            raise CypherError(f"UNWIND: {uvar}.{uprop} is not a property")
        df = df.withColumn(uout, F.explode(F.col(src_col)))
        plain.add(uout)

    cols = []
    agg_cols = []
    prop_alias: dict[tuple[str, str | None], str] = {}
    for raw_item in _split_items(m.group("items")):
        case = _case_col(raw_item, binds, plain)
        if case is not None:
            cols.append(case)
            continue
        fn_col = _scalar_fn_col(raw_item, binds, plain, df)
        if fn_col is not None:
            cols.append(fn_col)
            continue
        it = _ITEM.match(raw_item)
        if not it:
            raise CypherError(f"cannot parse RETURN item: {raw_item!r}")
        alias = it.group("alias")
        func = (it.group("func") or "").lower()
        if func in ("count", "collect", "min", "max", "sum", "avg"):
            agg_col, _ = _agg_expr(func, it.group("farg"), alias, binds, plain)
            agg_cols.append(agg_col)
        elif func == "labels":
            var = it.group("farg")
            if var not in binds:
                raise CypherError(f"unbound variable {var!r}")
            cols.append(_labels_col(binds[var]).alias(alias or f"labels_{var}"))
        elif func == "type":
            var = it.group("farg")
            if var not in state.get("edge_vars", set()):
                raise CypherError(
                    f"type() needs a relationship variable; {var!r} is not one"
                )
            cols.append(
                F.col(f"{binds[var]}__rel_type").alias(alias or f"type_{var}")
            )
        elif func == "length":
            var = it.group("farg")
            paths = state.get("paths", {})
            fixed = state.get("fixed_paths", {})
            if var in paths:
                cols.append(F.col(paths[var]).alias(alias or f"length_{var}"))
            elif var in fixed:
                cols.append(
                    F.lit(len(fixed[var]["rels"]))
                    .cast("int")
                    .alias(alias or f"length_{var}")
                )
            else:
                raise CypherError(
                    f"length() needs a path variable (p = ... or "
                    f"shortestPath); unknown: {var!r}"
                )
        elif func in ("nodes", "relationships"):
            var = it.group("farg")
            fixed = state.get("fixed_paths", {})
            if var not in fixed:
                raise CypherError(
                    f"{func}() needs a path variable bound on a FIXED-length "
                    f"chain (p = (a)-[:R]->(b)); unknown: {var!r}"
                )
            # Neo4j returns node/relationship OBJECTS; the DataFrame
            # projection is the identifying scalar per element — node
            # full_names / rel_type strings (documented simplification)
            if func == "nodes":
                arr = F.array(
                    *[F.col(f"{a}__full_name") for a in fixed[var]["nodes"]]
                )
            else:
                arr = F.array(*[F.lit(r) for r in fixed[var]["rels"]])
            cols.append(arr.alias(alias or f"{func}_{var}"))
        else:
            var, prop = it.group("var"), it.group("prop")
            if prop is None and var in plain:
                # a bare column projected by an earlier WITH
                cols.append(F.col(var).alias(alias or var))
                continue
            if var not in binds:
                raise CypherError(f"unbound variable {var!r}")
            if prop is None and var in state.get("edge_vars", set()):
                raise CypherError(
                    f"return a relationship property ({var}.rel_type / "
                    f"{var}.association_type), not the relationship itself"
                )
            p = binds[var]
            if alias:
                prop_alias[(var, prop)] = alias
            if prop == "code" and f"{p}__code" not in df.columns:
                # the reference stores `code` as the lazy <CODE> pointer
                # property (myClient.py:236-257); the graph keeps it as the
                # typed (file, start, end) triple — re-serialize on demand
                cols.append(
                    # NULL-pointer nodes (modules; unmatched OPTIONAL rows)
                    # render as NULL like Neo4j, not '<CODE>{}</CODE>'
                    F.when(
                        F.col(f"{p}__code_file").isNotNull(),
                        encode_code_pointer(
                            F.col(f"{p}__code_file"),
                            F.col(f"{p}__code_start"),
                            F.col(f"{p}__code_end"),
                        ),
                    ).alias(alias or f"{var}_{prop}")
                )
            elif prop:
                cols.append(F.col(f"{p}__{prop}").alias(alias or f"{var}_{prop}"))
            else:
                # whole-node return → its identity + kind (a stable, hashable
                # projection of the reference's Node record)
                cols.append(F.col(f"{p}__full_name").alias(alias or f"{var}_full_name"))
                cols.append(F.col(f"{p}__kind").alias(f"{var}_kind"))
    if agg_cols and cols:
        # Cypher implicit grouping: non-aggregated RETURN items become the
        # grouping key (one hash aggregate; map-side combine as usual)
        out = df.groupBy(*cols).agg(*agg_cols)
    elif agg_cols:
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
            if name not in out_cols and (var, prop) in prop_alias:
                # ORDER BY var.prop where the item was RETURNed under an
                # explicit alias (Cypher resolves either spelling)
                name = prop_alias[(var, prop)]
            if name not in out_cols:
                raise CypherError(
                    f"ORDER BY {raw.strip()!r} must reference a returned column"
                )
            c = F.col(name)
            if om.group("dir") and om.group("dir").upper() == "DESC":
                c = c.desc()
            order_cols.append(c)
        out = out.orderBy(*order_cols)

    if m.group("skip"):
        # SKIP before LIMIT, per Cypher; compiles to a logical Offset that
        # Spark folds into the same TakeOrdered when an ORDER BY precedes
        out = out.offset(int(m.group("skip")))
    if m.group("limit"):
        out = out.limit(int(m.group("limit")))
    return out


def _split_items(items: str) -> list[str]:
    """Split RETURN items on top-level commas — outside (), [], {} and
    string literals (a CASE branch may contain ``IN [1, 2]`` or a quoted
    comma)."""
    out: list[str] = []
    cur: list[str] = []
    depth = 0
    quote: str | None = None
    for ch in items:
        if quote:
            if ch == quote:
                quote = None
            cur.append(ch)
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
            continue
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    out.append("".join(cur))
    return [s for s in (p.strip() for p in out) if s]
