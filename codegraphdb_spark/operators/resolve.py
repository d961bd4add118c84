"""Second-pass name resolution as DataFrame joins — the Spark-native
replacement for jedi's per-name ``goto`` (reference A4, indexer_visitor.py;
SURVEY §2.A: "deep resolution is reproduced as a second-pass DataFrame
join"). One shuffle join against the symbol table instead of N subprocess
round-trips.

Resolution precedence for a textual reference ``head(.rest)`` seen in
module ``m``:
  1. absolute — the target already names a known symbol (covers the
     extractor's self.attr → Class.attr rewrite);
  2. import alias — ``head`` bound by an import in ``m``
     (from X import y as head / import X as head / import head);
  3. module-local — ``m.head(.rest)``;
  4. star import — ``X.head(.rest)`` for each ``from X import *`` in m
     (reference expands * against the target module's children,
     ast_manage.py:154-160);
  5. otherwise → the 'unsolved symbol' sentinel (index_utils.py:62).

Edge-type gates mirror the reference's materialization rules (§1.4):
CALL only lands on FUNCTION|METHOD (myClient.py:291-297; class-constructor
calls are dropped like the reference); USES only lands on
GLOBAL_VARIABLE|FIELD (myClient.py:299-305); INHERITS lands on CLASS or
the unsolved sentinel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from codegraphdb_spark.datamodel import UNSOLVED


def _bindings(imports: DataFrame) -> DataFrame:
    """(module, alias) → bound full_name for non-star imports.

    ``import a.b``      binds 'a'  → module 'a'
    ``import a.b as z`` binds 'z'  → module 'a.b'
    ``from X import y [as z]`` binds z|y → 'X.y'

    When one module rebinds the same alias via several imports, the LAST
    statement wins (Python rebinding semantics) — decided by the import's
    statement ordinal (code_start), never partition order.
    """
    non_star = imports.filter(~F.col("imp_is_star"))
    target = F.when(
        F.col("imp_target_name").isNotNull(),
        F.concat_ws(".", "imp_target_module", "imp_target_name"),
    ).otherwise(
        # plain `import a.b` without asname binds the FIRST segment
        F.when(
            F.col("imp_alias") == F.split("imp_target_module", r"\.")[0],
            F.col("imp_alias"),
        ).otherwise(F.col("imp_target_module"))
    )
    w = Window.partitionBy("bind_module", "alias").orderBy(
        F.col("__ord").desc_nulls_last(), F.col("bound_target")
    )
    return (
        non_star.select(
            F.col("module").alias("bind_module"),
            F.col("imp_alias").alias("alias"),
            target.alias("bound_target"),
            F.col("code_start").alias("__ord"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__ord", "__rn")
    )


def _star_imports(imports: DataFrame) -> DataFrame:
    return imports.filter(F.col("imp_is_star")).select(
        F.col("module").alias("star_module"),
        F.col("imp_target_module").alias("star_target"),
    ).distinct()


def resolve_refs(refs: DataFrame, imports: DataFrame, symbols: DataFrame) -> DataFrame:
    """refs(full_name=src, kind=CALL|USES|INHERITS, dst=textual target,
    module) → resolved edge facts (src, dst=full_name-or-UNSOLVED, rel_type).

    ``symbols`` is the merged nodes snapshot (full_name, kind).
    """
    sym = symbols.select(
        F.col("full_name").alias("sym_name"), F.col("kind").alias("sym_kind")
    )
    r = refs.select(
        F.col("full_name").alias("src"),
        F.col("kind").alias("rel_type"),
        F.col("dst").alias("target"),
        F.col("module").alias("ref_module"),
    ).dropDuplicates()
    r = r.withColumn("head", F.split("target", r"\.")[0]).withColumn(
        "rest",
        F.when(
            F.instr("target", ".") > 0,
            F.expr("substring(target, instr(target, '.'))"),
        ).otherwise(F.lit("")),
    )

    # 1. absolute
    r = r.join(
        sym.withColumnRenamed("sym_name", "target").withColumnRenamed(
            "sym_kind", "abs_kind"
        ),
        "target",
        "left",
    ).withColumn("abs_hit", F.col("abs_kind").isNotNull())

    # 2. import alias (NB: explicit F.col — `head`/`alias` collide with
    # DataFrame method names, so r.head / b.alias would be bound methods)
    b = _bindings(imports)
    r = r.join(
        b,
        (F.col("ref_module") == F.col("bind_module"))
        & (F.col("head") == F.col("alias")),
        "left",
    ).withColumn(
        "alias_candidate",
        F.when(F.col("bound_target").isNotNull(), F.concat("bound_target", "rest")),
    )

    # 3. module-local
    r = r.withColumn("local_candidate", F.concat_ws(".", "ref_module", "target"))

    # candidate prior to star handling, in precedence order
    r = r.withColumn(
        "candidate",
        F.when(F.col("abs_hit"), F.col("target")).otherwise(
            F.coalesce("alias_candidate", "local_candidate")
        ),
    )
    # validate candidate against symbol table
    r = r.join(
        sym.withColumnRenamed("sym_name", "candidate").withColumnRenamed(
            "sym_kind", "cand_kind"
        ),
        "candidate",
        "left",
    )

    # 4. star imports for still-unresolved refs
    s = _star_imports(imports)
    r = r.join(s, F.col("ref_module") == F.col("star_module"), "left").withColumn(
        "star_candidate",
        F.when(
            F.col("cand_kind").isNull() & F.col("star_target").isNotNull(),
            F.concat_ws(".", "star_target", "target"),
        ),
    )
    r = r.join(
        sym.withColumnRenamed("sym_name", "star_candidate").withColumnRenamed(
            "sym_kind", "star_kind"
        ),
        "star_candidate",
        "left",
    )

    resolved_name = F.coalesce(
        F.when(F.col("cand_kind").isNotNull(), F.col("candidate")),
        F.when(F.col("star_kind").isNotNull(), F.col("star_candidate")),
    )
    resolved_kind = F.coalesce("cand_kind", "star_kind")

    out = r.select(
        "src",
        "rel_type",
        resolved_name.alias("resolved"),
        resolved_kind.alias("resolved_kind"),
    )
    # a ref may have joined several star imports — any single resolution wins
    out = out.dropDuplicates(["src", "rel_type", "resolved"])

    call = out.filter(F.col("rel_type") == "CALL").withColumn(
        "dst",
        F.when(F.col("resolved_kind").isin("FUNCTION", "METHOD"), F.col("resolved"))
        .when(F.col("resolved").isNull(), F.lit(UNSOLVED)),
    ).filter(F.col("dst").isNotNull())

    uses = out.filter(
        (F.col("rel_type") == "USES")
        & F.col("resolved_kind").isin("GLOBAL_VARIABLE", "FIELD")
    ).withColumn("dst", F.col("resolved"))

    inherits = out.filter(F.col("rel_type") == "INHERITS").withColumn(
        "dst",
        F.when(F.col("resolved_kind") == "CLASS", F.col("resolved")).when(
            F.col("resolved").isNull(), F.lit(UNSOLVED)
        ),
    ).filter(F.col("dst").isNotNull())

    return (
        call.select("src", "dst", "rel_type")
        .unionByName(uses.select("src", "dst", "rel_type"))
        .unionByName(inherits.select("src", "dst", "rel_type"))
        .withColumn("association_type", F.lit(None).cast("string"))
        .dropDuplicates(["src", "dst", "rel_type"])
    )


def reexport_contains(imports: DataFrame, symbols: DataFrame, contains_edges: DataFrame) -> DataFrame:
    """E2: import/re-export resolution pass (build_modules_contain,
    ast_manage.py:101-167). For ``from X import y`` in module m, emit
    m-CONTAINS→X.y with association_type = y's kind; ``from X import *``
    expands to all CONTAINS children of X (ast_manage.py:154-160).
    Pure joins — the reference's per-import Cypher lookups and recursive
    __init__ re-index collapse into one pass over already-extracted facts."""
    sym = symbols.select(
        F.col("full_name").alias("sym_name"), F.col("kind").alias("sym_kind")
    )
    named = (
        imports.filter(~F.col("imp_is_star") & F.col("imp_target_name").isNotNull())
        .withColumn(
            "target", F.concat_ws(".", "imp_target_module", "imp_target_name")
        )
        .join(sym, F.col("target") == F.col("sym_name"))
        .select(
            F.col("module").alias("src"),
            F.col("target").alias("dst"),
            F.lit("CONTAINS").alias("rel_type"),
            F.col("sym_kind").alias("association_type"),
        )
    )
    star = (
        _star_imports(imports)
        .join(
            contains_edges.select(
                F.col("src").alias("star_target"),
                F.col("dst").alias("child"),
                F.col("association_type").alias("child_assoc"),
            ),
            "star_target",
        )
        .select(
            F.col("star_module").alias("src"),
            F.col("child").alias("dst"),
            F.lit("CONTAINS").alias("rel_type"),
            F.col("child_assoc").alias("association_type"),
        )
    )
    return (
        named.unionByName(star)
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst", "rel_type"])
    )
