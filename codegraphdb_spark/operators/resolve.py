"""Second-pass name resolution as DataFrame joins — the Spark-native
replacement for jedi's per-name ``goto`` (reference A4, indexer_visitor.py;
SURVEY §2.A: "deep resolution is reproduced as a second-pass DataFrame
join"). One shuffle join against the symbol table instead of N subprocess
round-trips.

Resolution precedence for a textual reference ``head(.rest)`` seen in
module ``m``:
  0. instance binding (deep pass, A4) — ``head`` (or a ``self.attr``
     chain) was assigned ``ClassName(...)`` / annotated ``: ClassName``,
     so the target rewrites to ``ClassName.rest`` — validated against the
     symbol table OR the inherited-method map (a method defined on a
     transitive base). This is the join-based stand-in for what jedi
     infers in the reference (indexer_visitor.py:125-157,
     index_utils.py:16-38);
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


def _maybe_b(df: DataFrame, small: bool) -> DataFrame:
    """Broadcast hint for the dimension side of resolution joins when the
    caller knows the repo is small (GraphEngine's small_repo hint). Without
    the hint the joins stay shuffle-partitioned — the correct default for
    a monorepo-scale symbol table — and AQE may still convert them at
    runtime."""
    return F.broadcast(df) if small else df


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


def _resolve_targets(
    r: DataFrame, imports: DataFrame, sym: DataFrame, small: bool = False
) -> DataFrame:
    """Steps 1-4 of the precedence chain for rows carrying (``target``,
    ``ref_module``): adds ``resolved`` / ``resolved_kind`` (null when no
    step validated against the symbol table). Passthrough columns survive.

    Implemented as ONE symbol-table join over an exploded candidate list
    (absolute > alias-or-local > star) with a per-row min-priority window,
    instead of one join per precedence step: 3 joins + 1 window total.
    Fewer stages at scale (the window's shuffle replaces two extra
    symbol-table shuffle joins) and a far shallower plan for Catalyst.

    A row whose mid-priority candidate fails but whose star candidate
    validates resolves through the star import; a row where NO candidate
    validates survives as a single ``resolved = null`` row. When several
    star imports validate, one row per validating star is kept (any-wins
    downstream, as before).

    ``sym`` columns: (sym_name, sym_kind)."""
    keep = r.columns
    r = r.withColumn("head", F.split("target", r"\.")[0]).withColumn(
        "rest",
        F.when(
            F.instr("target", ".") > 0,
            F.expr("substring(target, instr(target, '.'))"),
        ).otherwise(F.lit("")),
    ).withColumn(
        # CONTENT-derived row id, not monotonically_increasing_id: the
        # monotonic id is assigned downstream of a nondeterministic
        # shuffle, so partial stage recomputation (executor loss,
        # speculation) could reassign ids and mix different refs'
        # candidates inside one window partition. Identical logical rows
        # collapse to one id — harmless, edges are set-semantics
        # downstream.
        "__rid",
        F.md5(F.to_json(F.struct(*[F.col(c) for c in keep]))),
    )

    # import-alias binding (NB: explicit F.col — `head`/`alias` collide
    # with DataFrame method names, so r.head / b.alias would be bound
    # methods)
    b = _maybe_b(_bindings(imports), small)
    r = r.join(
        b,
        (F.col("ref_module") == F.col("bind_module"))
        & (F.col("head") == F.col("alias")),
        "left",
    ).withColumn(
        "alias_candidate",
        F.when(F.col("bound_target").isNotNull(), F.concat("bound_target", "rest")),
    )
    r = r.withColumn("local_candidate", F.concat_ws(".", "ref_module", "target"))

    # star imports fan out (one row per star import in the module)
    s = _maybe_b(_star_imports(imports), small)
    r = r.join(s, F.col("ref_module") == F.col("star_module"), "left").withColumn(
        "star_candidate",
        F.when(
            F.col("star_target").isNotNull(),
            F.concat_ws(".", "star_target", "target"),
        ),
    )

    # candidate list in precedence order: absolute beats scope-local
    # beats alias/local beats star (an existing alias binding shadows
    # module-local resolution even when the bound target does not
    # validate — Python rebinding). The scope-local candidate (r10) is
    # LEGB's L step, qualified by the CALLER entity itself: a call to a
    # NESTED def (``def outer(): def inner(): ...; inner()``) resolves
    # to src.target — the real-repo parity measure (DEEP_PARITY.md §2)
    # showed this single class accounted for 282 of 285 missed edges
    # (72.8% -> ~100% recall on the engine's own package). It sits above
    # alias/local because a local def shadows imports and globals, and
    # it is safe for every caller shape: a function/method scope sees
    # its own nested defs, and a class-body ref legitimately sees
    # previously-bound class attributes. Calls from doubly-nested
    # functions to an OUTER function's sibling defs (the E step's
    # deeper levels) stay unsolved — walking ancestor scopes would need
    # a kind-aware prefix filter to avoid faking class-attribute
    # visibility from method bodies, and the measured residual for that
    # class is zero on both the fixture and the real repo.
    cand = F.explode(
        F.array(
            F.struct(F.lit(0).alias("p"), F.col("target").alias("cand")),
            F.struct(
                F.lit(1).alias("p"),
                F.when(
                    F.col("src").isNotNull(),
                    F.concat_ws(".", "src", "target"),
                ).alias("cand"),
            ),
            F.struct(
                F.lit(2).alias("p"),
                F.coalesce("alias_candidate", "local_candidate").alias("cand"),
            ),
            F.struct(F.lit(3).alias("p"), F.col("star_candidate").alias("cand")),
        )
    )
    r = r.withColumn("__c", cand).select(
        *keep, "__rid", F.col("__c.p").alias("__p"), F.col("__c.cand").alias("__cand")
    )
    # keep the p=0 row even with a null candidate so a no-hit row still
    # emits one (resolved = null) output row per star fanout
    r = r.filter(F.col("__cand").isNotNull() | (F.col("__p") == 0))

    # the ONE symbol-table validation join
    r = r.join(
        _maybe_b(
            sym.withColumnRenamed("sym_name", "__cand"), small
        ),
        "__cand",
        "left",
    )
    w = Window.partitionBy("__rid")
    r = r.withColumn(
        "__min_hit",
        F.min(F.when(F.col("sym_kind").isNotNull(), F.col("__p"))).over(w),
    )
    r = r.filter(
        (F.col("__min_hit").isNull() & (F.col("__p") == 0))
        | (F.col("sym_kind").isNotNull() & (F.col("__p") == F.col("__min_hit")))
    )
    resolved_name = F.when(F.col("sym_kind").isNotNull(), F.col("__cand"))
    return r.select(
        *keep,
        resolved_name.alias("resolved"),
        F.col("sym_kind").alias("resolved_kind"),
    )


def base_resolution(
    refs: DataFrame,
    assigns: DataFrame,
    returns: DataFrame,
    imports: DataFrame,
    symbols: DataFrame,
    small: bool = False,
) -> DataFrame:
    """ONE precedence-chain pass over every row that needs textual→symbol
    resolution in a compile: refs (CALL/USES/INHERITS targets), assign
    facts (instance-binding type exprs) and returns facts (return
    annotations), tagged and unioned so the symbol table is probed exactly
    once per compile rather than once per fact family.

    Output columns: (__tag 'ref'|'assign'|'returns', src, rel_type,
    target, ref_module, bind_key, __ord, resolved, resolved_kind).
    The caller checkpoints this — every downstream derivation
    (return-type table, class bindings, deep overlay, edge gating) is
    cheap post-processing on the materialized result."""
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    r_refs = refs.select(
        F.lit("ref").alias("__tag"),
        F.col("full_name").alias("src"),
        F.col("kind").alias("rel_type"),
        F.col("dst").alias("target"),
        F.col("module").alias("ref_module"),
        F.col("class").alias("bind_key"),
        null_l.alias("__ord"),
    ).dropDuplicates()
    r_asg = assigns.select(
        F.lit("assign").alias("__tag"),
        null_s.alias("src"),
        # the rel_type slot carries the binding MODE for assign rows:
        # 'ALIAS' (a = Foo — name holds the symbol) vs NULL (instance)
        F.col("association_type").alias("rel_type"),
        F.col("dst").alias("target"),
        F.col("module").alias("ref_module"),
        F.col("full_name").alias("bind_key"),
        F.col("code_start").cast("long").alias("__ord"),
    )
    r_ret = returns.select(
        F.lit("returns").alias("__tag"),
        F.col("full_name").alias("src"),
        null_s.alias("rel_type"),
        F.col("dst").alias("target"),
        F.col("module").alias("ref_module"),
        null_s.alias("bind_key"),
        null_l.alias("__ord"),
    )
    sym = symbols.select(
        F.col("full_name").alias("sym_name"), F.col("kind").alias("sym_kind")
    )
    return _resolve_targets(
        r_refs.unionByName(r_asg).unionByName(r_ret), imports, sym, small
    )


def return_types_post(base: DataFrame, small: bool = False) -> DataFrame:
    """A4 return-type table from the base resolution: returns rows whose
    annotation resolved to a CLASS → (fn_name, ret_cls) — the static
    stand-in for jedi's return-type inference (reference
    indexer_visitor.py:125-157). min() keeps the pick deterministic if a
    star-import fanout ever resolves one annotation to several classes.

    Second tier (jedi-parity notch, round 4): returns rows resolving to a
    FIELD — the extractor's ``return self.attr`` getter inference, emitted
    on the field's ``Class.attr`` key — chain through the field's OWN
    binding: the last assign row on that key (same ordinal-wins ordering
    class_bindings_post applies), CLASS-typed directly (``self.vet =
    Trainer()`` / annotated class attr) or through the DIRECT return tier
    for factory-bound fields (``self.pet = make_animal()``). One level, no
    recursion — a getter returning a getter-bound field stays unresolved,
    matching the deliberate no-fixpoint stance of deepen_bindings."""
    direct = (
        base.filter(
            (F.col("__tag") == "returns") & (F.col("resolved_kind") == "CLASS")
        )
        .groupBy(F.col("src").alias("fn_name"))
        .agg(F.min("resolved").alias("ret_cls"))
    )
    field_rets = base.filter(
        (F.col("__tag") == "returns") & (F.col("resolved_kind") == "FIELD")
    ).select(F.col("src").alias("fn_name"), F.col("resolved").alias("__fld"))
    # field bindings straight off the assign rows (field keys are dotted
    # Class.attr — no '::'). Alias rows STAY IN the window with a NULL
    # binding (`self.x = Foo` binds the field to the class OBJECT, and a
    # getter returning it is not an instance of Foo): a LATER alias
    # rebind must win the window and kill the inference, exactly like a
    # poison row — filtering aliases out pre-window would resurrect a
    # stale earlier instance binding (last-assignment-wins violation).
    fa = base.filter(
        (F.col("__tag") == "assign") & ~F.col("bind_key").contains("::")
    )
    fa = fa.join(
        _maybe_b(
            direct.select(
                F.col("fn_name").alias("__rt_fn"), F.col("ret_cls").alias("__rt_cls")
            ),
            small,
        ),
        F.col("resolved") == F.col("__rt_fn"),
        "left",
    )
    not_alias = F.coalesce(F.col("rel_type"), F.lit("")) != "ALIAS"
    fbound = F.when(
        not_alias & (F.col("resolved_kind") == "CLASS"), F.col("resolved")
    ).when(
        not_alias & F.col("resolved_kind").isin("FUNCTION", "METHOD"),
        F.col("__rt_cls"),
    )
    w = Window.partitionBy("bind_key").orderBy(
        F.col("__ord").desc_nulls_last(),
        F.col("__fb").asc_nulls_last(),
        F.col("target").asc_nulls_last(),
    )
    field_map = (
        fa.withColumn("__fb", fbound)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & F.col("__fb").isNotNull())
        .select(F.col("bind_key").alias("__fld"), F.col("__fb").alias("ret_cls"))
    )
    via_field = field_rets.join(_maybe_b(field_map, small), "__fld").select(
        "fn_name", "ret_cls"
    )
    tier1 = (
        direct.unionByName(via_field)
        .groupBy("fn_name")
        .agg(F.min("ret_cls").alias("ret_cls"))
    )
    # Third tier (VERDICT r4 item 5): a returns row resolving to a
    # FUNCTION/METHOD is the chained-factory idiom — ``def breed_chain():
    # return breed()`` where breed's own return class is known (annotated,
    # ctor-inferred, or getter-chained). Bind through the callee's tier-1
    # entry. ONE level like every other tier — a chain of two unresolved
    # factories stays un-inferred (the deliberate no-fixpoint stance; jedi
    # recurses here, we document the residual instead). Matches reference
    # indexer_visitor.py:655-662 goto-through-call for the one-hop case.
    fn_rets = base.filter(
        (F.col("__tag") == "returns")
        & F.col("resolved_kind").isin("FUNCTION", "METHOD")
    ).select(F.col("src").alias("fn_name"), F.col("resolved").alias("__callee"))
    via_call = fn_rets.join(
        _maybe_b(
            tier1.select(
                F.col("fn_name").alias("__callee"), F.col("ret_cls")
            ),
            small,
        ),
        "__callee",
    ).select("fn_name", "ret_cls")
    return (
        tier1.unionByName(via_call)
        .groupBy("fn_name")
        .agg(F.min("ret_cls").alias("ret_cls"))
    )


def class_bindings_post(
    base: DataFrame, small: bool = False, ret: DataFrame | None = None
) -> DataFrame:
    """A4 phase 1 from the base resolution: assign rows → the CLASS
    full_name each binding holds an instance of, or NULL for a binding
    whose type is unknown (POISON row — an untyped rebind or unannotated
    parameter shadows outer bindings of the same name rather than
    resolving through them, matching Python scoping; ADVICE r2).

    A type expr resolving to a FUNCTION/METHOD consults the return-type
    table — ``x = make_animal()`` binds x to the annotated return class,
    like jedi. ALIAS bindings (``a = Foo`` / ``a = mod.Foo``, marked by
    the extractor) bind the name to the SYMBOL itself: an aliased
    FUNCTION/METHOD stays itself (calling the alias is calling the
    function, not its return type) and the output flag ``bound_alias``
    lets the overlay rewrite a bare-name ref equal to the binding key —
    valid only for aliases, never for instance bindings. Last assignment
    per key wins, by statement ordinal; a known type beats a poison row
    on the same ordinal."""
    resolved = base.filter(F.col("__tag") == "assign")
    if ret is None:
        ret = return_types_post(base, small)
    resolved = resolved.join(
        _maybe_b(
            ret.select(
                F.col("fn_name").alias("__rt_fn"),
                F.col("ret_cls").alias("__rt_cls"),
            ),
            small,
        ),
        F.col("resolved") == F.col("__rt_fn"),
        "left",
    )
    is_alias = F.col("rel_type") == "ALIAS"
    bound = (
        F.when(F.col("resolved_kind") == "CLASS", F.col("resolved"))
        .when(
            is_alias & F.col("resolved_kind").isin("FUNCTION", "METHOD"),
            F.col("resolved"),
        )
        .when(F.col("resolved_kind").isin("FUNCTION", "METHOD"), F.col("__rt_cls"))
    )
    resolved = resolved.withColumn("__bound", bound)
    w = Window.partitionBy("bind_key").orderBy(
        F.col("__ord").desc_nulls_last(),
        F.col("__bound").asc_nulls_last(),
        F.col("target").asc_nulls_last(),
    )
    return (
        resolved.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "bind_key",
            F.col("__bound").alias("bound_cls"),
            (F.coalesce(is_alias, F.lit(False)) & F.col("__bound").isNotNull()).alias(
                "bound_alias"
            ),
            # the winning row's raw type expr + binding mode, consumed by
            # deepen_bindings (second-level pass) — carrying them here
            # avoids a second window over the assign rows
            F.col("target").alias("win_target"),
            F.coalesce(is_alias, F.lit(False)).alias("win_alias"),
        )
    )


def deepen_bindings(
    base: DataFrame,
    bnd: DataFrame,
    sym: DataFrame,
    method_map: DataFrame | None = None,
    small: bool = False,
    ret: DataFrame | None = None,
) -> DataFrame:
    """ONE extra level of binding inference (jedi-parity notch, reference
    indexer_visitor.py:655-662): ``t = Trainer(); pet = t.recruit()``
    binds ``pet`` to recruit's ANNOTATED return class — the first pass
    leaves pet unresolved because its type expr ('t.recruit') heads at a
    local name only the binding table knows.

    Scope of the slice (conservative, false bindings are worse than
    missed ones): only keys the FIRST pass left null; only dotted targets
    whose head is a plain local/global name (scope::head — ``self.…``
    chains and field keys stay first-pass-only); resolution through the
    head's bound class, validated against the symbol table or the
    inherited-method map, then through the annotated-return table for
    callables. Keys that still fail REMAIN poison rows (shadowing intact).
    Not a fixpoint: exactly one extra level, no iteration."""
    if ret is None:
        ret = return_types_post(base, small)
    # the candidate set is read straight off class_bindings_post's output
    # (win_target/win_alias are the WINNING row's type expr and mode) —
    # no second window over the assign rows
    cand = (
        bnd.filter(
            F.col("bound_cls").isNull()
            & F.col("bind_key").contains("::")
            & F.col("win_target").isNotNull()
            & F.col("win_target").contains(".")
            & ~F.col("win_target").startswith("self.")
        )
        .withColumnRenamed("win_target", "target")
        .withColumn("__head", F.substring_index("target", ".", 1))
        .withColumn(
            "__lk",
            F.concat(
                F.substring_index("bind_key", "::", 1),
                F.lit("::"),
                F.col("__head"),
            ),
        )
    )
    heads = bnd.filter(F.col("bound_cls").isNotNull()).select(
        F.col("bind_key").alias("__lk"), F.col("bound_cls").alias("__hcls")
    )
    cand = cand.join(_maybe_b(heads, small), "__lk").withColumn(
        "__t2",
        F.concat(F.col("__hcls"), F.expr("substring(target, length(__head) + 1)")),
    )
    cand = cand.join(
        _maybe_b(
            sym.select(
                F.col("sym_name").alias("__t2"), F.col("sym_kind").alias("__k2")
            ),
            small,
        ),
        "__t2",
        "left",
    )
    if method_map is not None:
        cand = cand.join(
            _maybe_b(
                method_map.select(
                    F.col("derived_name").alias("__t2"),
                    F.col("method_name").alias("__mm"),
                ),
                small,
            ),
            "__t2",
            "left",
        )
    else:
        cand = cand.withColumn("__mm", F.lit(None).cast("string"))
    resolved2 = F.when(F.col("__k2").isNotNull(), F.col("__t2")).otherwise(
        F.col("__mm")
    )
    kind2 = F.when(F.col("__k2").isNotNull(), F.col("__k2")).when(
        F.col("__mm").isNotNull(), F.lit("METHOD")
    )
    cand = cand.withColumn("__r2", resolved2).withColumn("__kk2", kind2)
    cand = cand.join(
        _maybe_b(
            ret.select(F.col("fn_name").alias("__r2"), F.col("ret_cls").alias("__rc")),
            small,
        ),
        "__r2",
        "left",
    )
    is_alias = F.col("win_alias")
    bound2 = (
        F.when(F.col("__kk2") == "CLASS", F.col("__r2"))
        .when(is_alias & F.col("__kk2").isin("FUNCTION", "METHOD"), F.col("__r2"))
        .when(F.col("__kk2").isin("FUNCTION", "METHOD"), F.col("__rc"))
    )
    extra = (
        cand.select(
            "bind_key",
            bound2.alias("__b2"),
            (is_alias & bound2.isNotNull()).alias("__a2"),
        )
        .filter(F.col("__b2").isNotNull())
        # deterministic pick when several rows bind the same key (more
        # than one candidate chain validates): the smallest (bound
        # target, alias flag) pair — dropDuplicates(["bind_key"]) kept a
        # partition-order-dependent row, the build-nondeterminism class
        # VERDICT r9 flagged (15-vs-16-edge anomaly)
        .groupBy("bind_key")
        .agg(F.min(F.struct("__b2", "__a2")).alias("__s"))
        .select(
            "bind_key",
            F.col("__s.__b2").alias("__b2"),
            F.col("__s.__a2").alias("__a2"),
        )
    )
    return bnd.join(extra, "bind_key", "left").select(
        "bind_key",
        F.coalesce("bound_cls", "__b2").alias("bound_cls"),
        (
            F.coalesce("bound_alias", F.lit(False)) | F.coalesce("__a2", F.lit(False))
        ).alias("bound_alias"),
    )


def _deep_overlay(
    r: DataFrame,
    bnd: DataFrame,
    sym: DataFrame,
    method_map: DataFrame | None,
    small: bool = False,
    ret: DataFrame | None = None,
    fields: DataFrame | None = None,
) -> DataFrame:
    """A4 phase 2: rows whose ``bind_key`` (or its module-global fallback)
    matches a class binding get their target rewritten to
    ``bound_cls.rest`` and re-validated — against the symbol table, then
    against ``method_map`` (derived_name → inherited method) so calls to
    methods a class only INHERITS still land on the defining base. A deep
    hit overrides the step 1-4 result (locals shadow imports/globals).

    The binding lookup walks the FULL lexical chain (r10 — LEGB's E
    step): scope::head, then each enclosing FUNCTION scope's key, then
    module::head, then the call-prefix slot — as ONE exploded-key join
    with a per-row min-level window, not one join per level. A poison
    row (rebind of unknown type, unannotated parameter) at ANY level
    matches with a null ``bound_cls`` and thereby SUPPRESSES every
    deeper level — Python shadowing must not fabricate an edge through
    a same-named name in an outer scope (ADVICE r2). Intermediate
    CLASS scopes are excluded from the chain: a method body does NOT
    see class attributes as bare names, so ``p.mod.K::x`` must never
    bind a ref in ``p.mod.K.m`` (only local and module levels are
    kind-exempt — the local scope may legitimately BE a class body).
    Closes DEEP_PARITY.md §2's last residual class: a nested def
    calling methods on an instance variable bound in its enclosing
    function (``eng = Engine(); def side(): eng.compile()``)."""
    keep = r.columns
    r = r.withColumn(
        "__did", F.md5(F.to_json(F.struct(*[F.col(c) for c in keep])))
    )
    # r9: the call-prefix slot for 'a.b().rest' chains where 'a' is a
    # module alias, not a variable: no scope::a binding can exist, but
    # extraction emitted a synthetic binding under 'scope::a.b()' typed
    # by a.b's return. Lowest priority: consulted only when every
    # lexical level misses, so variable shadowing semantics are
    # untouched.
    call_prefix = F.when(
        F.col("bind_key").contains("::") & F.col("target").contains("()"),
        F.expr("substring(target, 1, instr(target, '()') + 1)"),
    )
    scope_part = F.substring_index("bind_key", "::", 1)
    head_part = F.substring_index("bind_key", "::", -1)
    parts = F.split(scope_part, "\\.")
    nmod = F.size(F.split("ref_module", "\\."))
    lexical = F.when(
        F.col("bind_key").contains("::")
        & F.col("ref_module").isNotNull()
        & scope_part.startswith(F.col("ref_module")),
        F.transform(
            F.sequence(F.size(parts), nmod, F.lit(-1)),
            lambda i: F.concat(
                F.array_join(F.slice(parts, F.lit(1), i), "."),
                F.lit("::"),
                head_part,
            ),
        ),
    ).when(
        F.col("bind_key").contains("::"),
        # scope outside the ref module (defensive): local + module only
        F.array(
            F.col("bind_key"),
            F.concat(F.col("ref_module"), F.lit("::"), head_part),
        ),
    ).otherwise(F.array(F.col("bind_key")))  # field keys: Class.attr
    ck = F.when(
        call_prefix.isNotNull(),
        F.concat(scope_part, F.lit("::"), call_prefix),
    )
    chain = F.when(
        ck.isNotNull(), F.concat(lexical, F.array(ck))
    ).otherwise(lexical)
    r = r.withColumn("__nsc", F.size(lexical))
    ex = r.select(
        "__did",
        "__nsc",
        F.posexplode_outer(chain).alias("__lvl", "__key"),
    ).filter(F.col("__key").isNotNull())
    # intermediate levels bind only through FUNCTION/METHOD scopes
    classes = sym.filter(F.col("sym_kind") == "CLASS").select(
        F.col("sym_name").alias("__cls_scope")
    )
    ex = ex.join(
        _maybe_b(classes, small),
        F.substring_index("__key", "::", 1) == F.col("__cls_scope"),
        "left",
    ).filter(
        (F.col("__lvl") == 0)
        | (F.col("__lvl") >= F.col("__nsc") - 1)
        | F.col("__cls_scope").isNull()
    )
    ex = ex.join(
        _maybe_b(
            bnd.select(
                F.col("bind_key").alias("__key"),
                F.col("bound_cls").alias("__bcls"),
                F.col("bound_alias").alias("__bal"),
                F.lit(True).alias("__hit"),
            ),
            small,
        ),
        "__key",
        "left",
    )
    wd = Window.partitionBy("__did")
    ex = ex.withColumn(
        "__best", F.min(F.when(F.col("__hit"), F.col("__lvl"))).over(wd)
    )
    pick = ex.filter(F.col("__hit") & (F.col("__lvl") == F.col("__best"))).select(
        "__did",
        F.col("__bcls").alias("__bound"),
        F.col("__bal").alias("__balias"),
        (F.col("__lvl") >= F.col("__nsc")).alias("__used_ck"),
    )
    r = r.join(_maybe_b(pick, small), "__did", "left")
    # best lexical row (even a poison one) wins; the call-prefix slot
    # binds only when every lexical level missed
    bound = F.col("__bound")
    alias_flag = F.coalesce(F.col("__balias"), F.lit(False))
    used_call_key = F.coalesce(F.col("__used_ck"), F.lit(False))
    # the prefix the binding replaces: 'head' for scope::head keys, the
    # full Class.attr name for field keys, the call expression itself
    # when the call-prefix slot bound
    prefix = F.when(used_call_key, call_prefix).when(
        F.col("bind_key").contains("::"), F.substring_index("bind_key", "::", -1)
    ).otherwise(F.col("bind_key"))
    # a target EQUAL to the prefix (a call through the bare name) rewrites
    # only for ALIAS bindings — ``Beast = Animal; Beast(...)`` resolves to
    # the class; for instance bindings the bare name is the instance, not
    # its class, so equality stays un-rewritten
    r = r.withColumn("__prefix", prefix)
    # r9 A4 chain walk: reduce the post-rewrite remainder one segment at a
    # time — plain segments through FIELD bindings (``Class.attr`` keys in
    # the binding table, which r9 also gives @property methods), '()'
    # segments through the return-type table — so ``self.car.engine.
    # start()``, ``g.car.engine.gauge().read()`` and ``make_garage().car.
    # drive()`` resolve like jedi resolves them (the reference's
    # indexer_visitor.py:655-662). Bounded unroll (no fixpoint): 3 hops
    # covers a 4-segment remainder; deeper chains stay unsolved, loudly.
    rest0 = F.when(
        bound.isNotNull() & (F.length("target") > F.length("__prefix")),
        F.expr("substring(target, length(__prefix) + 1)"),
    )
    r = r.withColumn("__wcls", F.when(rest0.isNotNull(), bound)).withColumn(
        "__wrest", rest0
    )
    if fields is None:
        fields = bnd.filter(
            ~F.col("bind_key").contains("::") & F.col("bound_cls").isNotNull()
        ).select(
            F.col("bind_key").alias("__f_key"), F.col("bound_cls").alias("__f_cls")
        )
    # r10 (VERDICT r9 item 6): the r9 unroll ran the WHOLE wide resolve
    # frame through six joins (fields + returns per hop), and the
    # alternating-worktree A/B priced that at +2.2s of graph build
    # (r8 8.30s -> r9 10.50s median) — dominated by driver-side plan
    # compilation of the deep wide plan, not row work. The walk is a
    # pure function of the (class, remainder) pair, so run it over the
    # DISTINCT pairs on a slim two-column frame instead: one tagged
    # lookup table (FIELD rows and return rows disambiguated by an
    # is-call flag in the join key) makes each hop ONE join, and the
    # wide frame gains a single join-back. 3 slim joins + 1 wide join
    # replaces 6 wide joins; semantics are identical, including
    # ambiguous lookups (duplicate hop rows fan out pairs exactly as
    # they fanned out the wide frame before — set-dedup downstream).
    hop_tbl = fields.select(
        F.col("__f_key").alias("__hk"),
        F.lit(False).alias("__hcall"),
        F.col("__f_cls").alias("__hcls"),
    )
    if ret is not None:
        hop_tbl = hop_tbl.unionByName(
            ret.select(
                F.col("fn_name").alias("__hk"),
                F.lit(True).alias("__hcall"),
                F.col("ret_cls").alias("__hcls"),
            )
        )
    body0 = F.expr("substring(__wrest, 2)")
    needs_walk = F.col("__wrest").isNotNull() & (
        F.size(F.split(body0, "\\.")) >= 2
    )
    pairs = (
        r.filter(needs_walk)
        .select(
            F.col("__wcls").alias("__p_cls"), F.col("__wrest").alias("__p_rest")
        )
        .distinct()
        .withColumn("__c", F.col("__p_cls"))
        .withColumn("__w", F.col("__p_rest"))
    )
    for _hop in range(3):
        body = F.expr("substring(__w, 2)")  # drop the leading '.'
        pairs = pairs.withColumn(
            "__seg", F.substring_index(body, ".", 1)
        ).withColumn("__nseg", F.size(F.split(body, "\\.")))
        key = F.concat(
            F.col("__c"), F.lit("."), F.regexp_replace("__seg", "\\(\\)$", "")
        )
        pairs = pairs.withColumn(
            "__hk", F.when(F.col("__nseg") >= 2, key)
        ).withColumn("__hcall", F.col("__seg").endswith("()"))
        pairs = pairs.join(
            _maybe_b(hop_tbl, small), ["__hk", "__hcall"], "left"
        )
        step = (F.col("__nseg") >= 2) & F.col("__hcls").isNotNull()
        pairs = (
            pairs.withColumn(
                "__w2",
                F.when(
                    step, F.expr("substring(__w, length(__seg) + 2)")
                ).otherwise(F.col("__w")),
            )
            .withColumn("__c", F.when(step, F.col("__hcls")).otherwise(F.col("__c")))
            .drop("__w", "__hcls", "__hk", "__hcall", "__seg", "__nseg")
            .withColumnRenamed("__w2", "__w")
        )
    walked = pairs.select(
        "__p_cls",
        "__p_rest",
        F.col("__c").alias("__walked_cls"),
        F.col("__w").alias("__walked_rest"),
    )
    r = r.join(
        _maybe_b(walked, small),
        (F.col("__wcls") == F.col("__p_cls"))
        & (F.col("__wrest") == F.col("__p_rest")),
        "left",
    )
    r = (
        r.withColumn("__wcls", F.coalesce("__walked_cls", "__wcls"))
        .withColumn("__wrest", F.coalesce("__walked_rest", "__wrest"))
        .drop("__p_cls", "__p_rest", "__walked_cls", "__walked_rest")
    )
    r = r.withColumn(
        "__deep_target",
        F.when(
            F.col("__wcls").isNotNull(), F.concat("__wcls", "__wrest")
        ).when(
            bound.isNotNull() & alias_flag & (F.col("target") == F.col("__prefix")),
            bound,
        ),
    )
    r = r.join(
        _maybe_b(
            sym.select(
                F.col("sym_name").alias("__deep_target"),
                F.col("sym_kind").alias("__deep_kind"),
            ),
            small,
        ),
        "__deep_target",
        "left",
    )
    if method_map is not None:
        r = r.join(
            _maybe_b(
                method_map.select(
                    F.col("derived_name").alias("__deep_target"),
                    F.col("method_name").alias("__map_actual"),
                ),
                small,
            ),
            "__deep_target",
            "left",
        )
    else:
        r = r.withColumn("__map_actual", F.lit(None).cast("string"))
    deep_resolved = F.when(
        F.col("__deep_kind").isNotNull(), F.col("__deep_target")
    ).otherwise(F.col("__map_actual"))
    deep_kind = F.when(F.col("__deep_kind").isNotNull(), F.col("__deep_kind")).when(
        F.col("__map_actual").isNotNull(), F.lit("METHOD")
    )
    out_resolved = F.coalesce(deep_resolved, F.col("resolved")).alias("resolved")
    out_kind = F.when(deep_resolved.isNotNull(), deep_kind).otherwise(
        F.col("resolved_kind")
    ).alias("resolved_kind")
    keep_minus = [c for c in keep if c not in ("resolved", "resolved_kind")]
    return r.select(*keep_minus, out_resolved, out_kind)


def gate_edges(resolved_rows: DataFrame) -> DataFrame:
    """Resolved rows (src, rel_type, resolved, resolved_kind) → edge facts
    (src, dst, rel_type, association_type), applying the reference's
    edge-type materialization gates (§1.4): CALL lands only on
    FUNCTION|METHOD (myClient.py:291-297; class-constructor calls dropped
    like the reference), USES only on GLOBAL_VARIABLE|FIELD
    (myClient.py:299-305), INHERITS on CLASS or the unsolved sentinel;
    unresolved CALL/INHERITS → UNSOLVED (index_utils.py:62)."""
    out = resolved_rows.select("src", "rel_type", "resolved", "resolved_kind")
    # a ref may have joined several star imports — collapse identical
    # resolutions. resolved_kind is IN the key (r10): two kinds for one
    # resolved name each gate independently and the final
    # (src, dst, rel_type) dedup below stays set-deterministic; keying
    # only (src, rel_type, resolved) kept an arbitrary kind row, so the
    # gate's FUNCTION|METHOD test could flip between builds
    out = out.dropDuplicates(["src", "rel_type", "resolved", "resolved_kind"])

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
        # deterministic association_type when the same CONTAINS edge
        # arises with two kinds (a name that is both, e.g., re-exported
        # as CLASS and FUNCTION): smallest kind wins, never a
        # partition-order pick
        .groupBy("src", "dst", "rel_type")
        .agg(F.min("association_type").alias("association_type"))
    )
