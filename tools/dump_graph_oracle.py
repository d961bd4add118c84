"""Dump the graph-fixture ORACLE INPUT tables as deterministic CSVs.

The g_* catalog's recomputing oracles (queries/graph.py) let DuckDB
independently re-derive merge (B1/B3 priority window), the E1 inherited-
method closure (WITH RECURSIVE), call-graph reachability, connected
components, and B7 version stamping — instead of pinning literal golden
rows. DuckDB's inputs are the tables this tool writes:

  node_facts_v{1,2}.csv       raw extraction node facts (pre-merge)
  pre_closure_edges_v{1,2}.csv  resolved edges BEFORE the E1 closure adds
                                inherited HAS_METHOD rows

The differential boundary is deliberate: Python AST extraction and the
resolution joins cannot be re-run by a SQL engine, so those stay covered
by the deep-resolution goldens + extractor property tests; everything
DOWNSTREAM of resolution (merge windows, recursive closures, components,
stamping — the reference's ast_manage.py:79-99 / update_version.py:21-44
behaviors) is recomputed from these inputs by an independent engine.

The CSVs are committed (tests/fixtures/graph_oracle/); the mini-repo is
embedded and deterministic, so tests/test_graph_oracle_fixtures.py
regenerates them and asserts byte-equality — the committed inputs can
never silently go stale.

Usage: python tools/dump_graph_oracle.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "graph_oracle",
)


def dump_tables(spark) -> dict[str, "object"]:
    """Run the two-version fixture build with the engine's capture hook on
    and return {csv_basename: sorted pandas frame}. Same data path as
    queries/graph._graph (v1 extract+compile, prepare_update_facts →
    v2 compile) minus the concurrency tricks, which do not affect results."""
    from codegraphdb_spark import mini_repo
    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.sources.repo import files_from_pairs

    eng = GraphEngine(spark, small_repo=True)
    eng.capture = {}
    f1 = eng.extract(
        files_from_pairs(spark, mini_repo.V1 + mini_repo.DEEP_V1)
    ).localCheckpoint(eager=True)
    eng.compile(f1, "v1")
    facts2 = eng.prepare_update_facts(
        f1,
        files_from_pairs(spark, mini_repo.V2_CHANGED_ONLY),
        mini_repo.CHANGE_LIST,
    )
    eng.compile(facts2, "v2")

    out = {}
    for ver in ("v1", "v2"):
        cap = eng.capture[ver]
        nf = (
            cap["node_facts"]
            .select("full_name", "kind", "name", "file_path", "code_start")
            .toPandas()
        )
        if nf.isna().any().any():
            raise AssertionError(
                "node facts contain NULLs — the CSV dump assumes none "
                "(extend the writer with an explicit nullstr first)"
            )
        nf["code_start"] = nf["code_start"].astype("int64")
        out[f"node_facts_{ver}.csv"] = nf.sort_values(
            list(nf.columns), kind="mergesort"
        ).reset_index(drop=True)
        pe = (
            cap["pre_closure_edges"]
            .select("src", "dst", "rel_type", "association_type")
            .toPandas()
        )
        # association_type is legitimately NULL on resolved edges — it is
        # written as the empty field and read back with nullstr='' in the
        # oracles; the key columns must stay NULL-free
        if pe[["src", "dst", "rel_type"]].isna().any().any():
            raise AssertionError("pre-closure edge key columns contain NULLs")
        out[f"pre_closure_edges_{ver}.csv"] = pe.sort_values(
            list(pe.columns), kind="mergesort"
        ).reset_index(drop=True)

    # per-version code-pointer facts + the v2 file contents — the code
    # render oracles (g_code_hydration, g_cypher_code) re-derive the
    # merged signature/pointer columns and the slice+dedent expansion
    # from these instead of pinning the rendered strings
    for ver in ("v1", "v2"):
        cf = (
            eng.capture[ver]["node_facts"]
            .filter("code_file IS NOT NULL")
            .select(
                "full_name", "kind", "name", "file_path", "code_start",
                "code_end", "signature", "code_file",
            )
            .toPandas()
        )
        # signature is legitimately NULL on module/field/global pointer
        # rows; signatures are never empty strings, so '' round-trips as
        # the NULL marker (nullif in the oracles). Key + pointer columns
        # must stay NULL-free.
        if cf.drop(columns=["signature"]).isna().any().any():
            raise AssertionError(
                "code facts contain NULLs outside signature"
            )
        cf["signature"] = cf["signature"].fillna("")
        for c in ("code_start", "code_end"):
            cf[c] = cf[c].astype("int64")
        out[f"code_facts_{ver}.csv"] = cf.sort_values(
            list(cf.columns), kind="mergesort"
        ).reset_index(drop=True)
    import pandas as pd

    out["files_v2.csv"] = pd.DataFrame(
        sorted(mini_repo.V2), columns=["path", "content"]
    ).reset_index(drop=True)

    # raw v1 import facts — g_blast_radius' oracle re-derives the module
    # import graph + reverse reachability (incremental.py::affected_files)
    # from these instead of pinning the affected file list
    imp = (
        f1.filter("fact = 'import'")
        .select("module", "imp_target_module", "imp_target_name", "imp_is_star")
        .toPandas()
    )
    if imp[["module", "imp_target_module"]].isna().any().any():
        raise AssertionError("import fact key columns contain NULLs")
    # imp_target_name is NULL for plain `import a.b` — identifiers are
    # never empty, so '' round-trips as the NULL marker (nullif in SQL)
    imp["imp_target_name"] = imp["imp_target_name"].fillna("")
    imp["imp_is_star"] = imp["imp_is_star"].fillna(False).astype(bool)
    out["import_facts_v1.csv"] = imp.sort_values(
        list(imp.columns), kind="mergesort"
    ).reset_index(drop=True)

    # import facts of the cycle fixture (mini_repo.CYCLE_V1) — the
    # g_import_cycles oracle re-derives the dotted-prefix import graph and
    # the SCC grouping (bounded-depth recursive reachability) from these.
    # Extraction facts only: the cycle query never compiles a graph.
    cyc = (
        eng.extract(files_from_pairs(spark, mini_repo.CYCLE_V1))
        .filter("fact = 'import'")
        .select("module", "imp_target_module", "imp_target_name", "imp_is_star")
        .toPandas()
    )
    if cyc[["module", "imp_target_module"]].isna().any().any():
        raise AssertionError("cycle import fact key columns contain NULLs")
    cyc["imp_target_name"] = cyc["imp_target_name"].fillna("")
    cyc["imp_is_star"] = cyc["imp_is_star"].fillna(False).astype(bool)
    out["cycle_import_facts.csv"] = cyc.sort_values(
        list(cyc.columns), kind="mergesort"
    ).reset_index(drop=True)
    return out


def main() -> int:
    from codegraphdb_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else FIXTURE_DIR
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-graph-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    for name, pdf in dump_tables(spark).items():
        path = os.path.join(out_dir, name)
        pdf.to_csv(path, index=False, lineterminator="\n")
        print(f"wrote {path} ({len(pdf)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
