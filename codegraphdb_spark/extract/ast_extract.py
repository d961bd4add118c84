"""AST fact extraction (reference A3: shallow_indexer.py:74-625; the deep
indexer A4's jedi resolution is reproduced as a second-pass DataFrame join
in operators/resolve.py — per SURVEY §2.A A4, jedi's per-env subprocess
does not distribute, so name resolution becomes set-oriented).

Shape: files DataFrame (path, content) → ``mapInPandas`` with Python's
stdlib ``ast`` → one fact row per symbol / local edge / import / raw
reference (FACTS_SCHEMA). The extractor is embarrassingly parallel — one
task per file partition, no shared state, no locks (the reference needed a
global file lock around every write, graphDB.py:18-33; here extraction is
pure and merging is a deterministic downstream job).

Emitted facts mirror the reference's materialized surface (SURVEY §1.4):
- node facts: MODULE / CLASS / FUNCTION / METHOD / GLOBAL_VARIABLE / FIELD
  with name, file_path, enclosing class, signature and a lazy code pointer
  (myClient.py:153-257).
- edge facts (local, no resolution needed): CONTAINS (module → top-level
  def, with association_type, myClient.py:187-194), HAS_METHOD
  (myClient.py:195-199), HAS_FIELD (myClient.py:200-204).
- import facts: per `import X` / `from X import y [as z]` / `from X import *`
  with relative-import level resolution (ast_utils.py:64-95) — input to the
  E2 re-export pass and the reference resolver.
- ref facts: raw CALL / USES / INHERITS references with the *textual*
  target (dotted path or self.attr already rewritten to Class.attr);
  resolution happens in the join pass. Module-level calls are suppressed
  exactly like the reference (myClient.py:294).
- error facts: files that fail to parse (reference records error tokens,
  shallow_indexer.py:521-522) — never fail the job for one bad file.
"""

from __future__ import annotations

import ast
from collections.abc import Iterator
from typing import Any

import pandas as pd

from codegraphdb_spark.datamodel import FACTS_SCHEMA

_COLS = [f.name for f in FACTS_SCHEMA.fields]


def _module_name(path: str) -> str:
    name = path[:-3] if path.endswith(".py") else path
    parts = name.split("/")
    if parts and parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(p for p in parts if p)


def _dotted(expr: ast.AST) -> str | None:
    """Render a Name / Attribute chain as 'a.b.c'; None for anything
    dynamic (subscripts, calls, lambdas) — the reference punts those to
    'unsolved symbol' too (index_utils.py:62)."""
    parts: list[str] = []
    node = expr
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        parts.append(node.id)
        return ".".join(reversed(parts))
    return None


def _dotted_chain(expr: ast.AST) -> str | None:
    """Render a Name / Attribute / Call chain with '()' marking the call
    links: ``self.engine.gauge().read`` → 'self.engine.gauge().read',
    ``make_garage().car.drive`` → 'make_garage().car.drive' (r9 A4: the
    jedi parity shapes C4/C6/C9 — the reference resolves these via
    Script.goto; the join-based pass resolves the '()' segments through
    the return-type table). Call ARGUMENTS contribute nothing (only the
    callee chain matters for the type walk); anything else dynamic
    (subscripts, lambdas, starred) still returns None."""
    parts: list[str] = []
    node = expr
    pending_call = False  # the next appended segment is a callee
    while True:
        if isinstance(node, ast.Attribute):
            parts.append(node.attr + ("()" if pending_call else ""))
            pending_call = False
            node = node.value
        elif isinstance(node, ast.Call):
            if pending_call:
                return None  # f()() — dynamic double call, punt
            pending_call = True
            node = node.func
        elif isinstance(node, ast.Name):
            parts.append(node.id + ("()" if pending_call else ""))
            return ".".join(reversed(parts))
        else:
            return None


def _signature(src_lines: list[str], node: ast.AST) -> str:
    """Header line(s) of a def/class: from its first line to the line the
    body starts on (reference slices the symbol's *location* range,
    myClient.py:208-228)."""
    body_line = node.body[0].lineno if getattr(node, "body", None) else node.lineno + 1
    end = min(body_line - 1, len(src_lines))
    return "\n".join(src_lines[node.lineno - 1 : end]).strip()


class _Extractor(ast.NodeVisitor):
    def __init__(self, path: str, source: str) -> None:
        self.path = path
        self.module = _module_name(path)
        self.lines = source.split("\n")
        self.facts: list[dict[str, Any]] = []
        # lexical context
        self.class_stack: list[str] = []  # full_names
        self.func_stack: list[str] = []  # full_names
        self.seen_fields: set[str] = set()
        self._synth_slots: set[str] = set()  # r9: call-result slots emitted

    # --- fact emitters ---------------------------------------------------

    def _base(self) -> dict[str, Any]:
        return dict.fromkeys(_COLS)

    def node_fact(self, full_name: str, kind: str, name: str, node: ast.AST | None,
                  cls: str | None = None, signature: str | None = None) -> None:
        f = self._base()
        f.update(
            fact="node", full_name=full_name, kind=kind, name=name,
            file_path=self.path, module=self.module, signature=signature,
        )
        f["class"] = cls
        if node is not None:
            f.update(
                code_file=self.path,
                code_start=node.lineno,
                code_end=getattr(node, "end_lineno", node.lineno),
            )
        self.facts.append(f)

    def edge_fact(self, src: str, rel: str, dst: str, assoc: str | None = None) -> None:
        f = self._base()
        f.update(fact="edge", full_name=src, kind=rel, dst=dst,
                 association_type=assoc, module=self.module, file_path=self.path)
        self.facts.append(f)

    def ref_fact(self, src: str, rel: str, target: str,
                 bind_key: str | None = None) -> None:
        f = self._base()
        f.update(fact="ref", full_name=src, kind=rel, dst=target,
                 module=self.module, file_path=self.path)
        # candidate instance-binding key for the deep (A4) resolution pass,
        # carried in the otherwise-unused 'class' column of ref facts
        f["class"] = bind_key
        self.facts.append(f)

    def assign_fact(
        self, bind_key: str, type_expr: str | None, lineno: int, alias: bool = False
    ) -> None:
        """A4 type-propagation fact: ``bind_key`` (scope::var for locals,
        Class.attr for class/instance fields) was (re)bound — to an
        instance of ``type_expr`` (textual ctor / annotation target,
        resolved against the symbol table in the deep pass — the join-based
        stand-in for jedi's inference, reference indexer_visitor.py:125-157)
        when one is statically visible, else to an UNKNOWN type
        (``type_expr`` None). Unknown rebinds matter as much as known ones:
        they are POISON rows that stop the deep pass from resolving through
        a binding that Python shadowing has invalidated."""
        f = self._base()
        f.update(fact="assign", full_name=bind_key, dst=type_expr,
                 module=self.module, file_path=self.path, code_start=lineno,
                 # ALIAS marks a bare Name/Attribute RHS (a = Foo): the
                 # name holds the SYMBOL, not an instance — the deep pass
                 # may rewrite a ref equal to the bare name (a call through
                 # the alias), which is wrong for instance bindings
                 association_type="ALIAS" if alias else None)
        self.facts.append(f)

    def returns_fact(self, func_full_name: str, type_expr: str, lineno: int) -> None:
        """A4 return-type fact: calling ``func_full_name`` yields an
        instance of ``type_expr`` (the dotted return annotation) — lets
        ``x = make_animal(); x.speak()`` resolve like jedi does on the
        reference's deep path (indexer_visitor.py:125-157)."""
        f = self._base()
        f.update(fact="returns", full_name=func_full_name, dst=type_expr,
                 module=self.module, file_path=self.path, code_start=lineno)
        self.facts.append(f)

    def import_fact(self, target_module: str, target_name: str | None,
                    alias: str | None, is_star: bool, lineno: int) -> None:
        f = self._base()
        f.update(
            fact="import", full_name=self.module, module=self.module,
            file_path=self.path, imp_target_module=target_module,
            imp_target_name=target_name, imp_alias=alias, imp_is_star=is_star,
            # statement ordinal, so the resolver can apply Python's
            # last-import-wins when one module rebinds the same alias
            code_start=lineno,
        )
        self.facts.append(f)

    # --- context helpers ---------------------------------------------------

    @property
    def scope(self) -> str:
        """Innermost def/class full_name, or the module."""
        if self.func_stack:
            return self.func_stack[-1]
        if self.class_stack:
            return self.class_stack[-1]
        return self.module

    @property
    def in_module_scope(self) -> bool:
        return not self.func_stack and not self.class_stack

    def qualify(self, name: str) -> str:
        if self.func_stack:
            return f"{self.func_stack[-1]}.{name}"
        if self.class_stack:
            return f"{self.class_stack[-1]}.{name}"
        return f"{self.module}.{name}"

    # --- visitors ----------------------------------------------------------

    def run(self, tree: ast.Module) -> None:
        self.node_fact(self.module, "MODULE", self.module, node=None)
        # module code span = whole file (ast.Module carries no lineno)
        self.facts[-1]["code_start"] = 1
        self.facts[-1]["code_end"] = len(self.lines)
        self.facts[-1]["code_file"] = self.path
        for child in tree.body:
            self.visit(child)

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        for dec in node.decorator_list:
            self.visit(dec)
        full = self.qualify(node.name)
        enclosing_class = self.class_stack[-1] if self.class_stack else None
        self.node_fact(full, "CLASS", node.name, node,
                       cls=enclosing_class, signature=_signature(self.lines, node))
        if self.in_module_scope:
            self.edge_fact(self.module, "CONTAINS", full, assoc="CLASS")
        for base in node.bases:
            target = _dotted(base)
            if target:
                self.ref_fact(full, "INHERITS", target)
        self.class_stack.append(full)
        for child in node.body:
            self.visit(child)
        self.class_stack.pop()

    def _visit_def(self, node: ast.FunctionDef | ast.AsyncFunctionDef) -> None:
        # decorators and parameter DEFAULTS evaluate in the enclosing
        # scope at def time — visit them before entering the new scope so
        # their CALL/USES refs are recorded (jedi records these;
        # module-level ones stay suppressed by the usual scope gates)
        for dec in node.decorator_list:
            self.visit(dec)
        for default in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            self.visit(default)
        full = self.qualify(node.name)
        in_class = bool(self.class_stack) and not self.func_stack
        if in_class:
            self.node_fact(full, "METHOD", node.name, node,
                           cls=self.class_stack[-1],
                           signature=_signature(self.lines, node))
            self.edge_fact(self.class_stack[-1], "HAS_METHOD", full)
        else:
            self.node_fact(full, "FUNCTION", node.name, node,
                           signature=_signature(self.lines, node))
            if self.in_module_scope:
                self.edge_fact(self.module, "CONTAINS", full, assoc="FUNCTION")
        if node.returns is not None:
            ret = _dotted(node.returns)
            if ret:
                self.returns_fact(full, ret, node.lineno)
        else:
            # jedi-parity static inference for the unannotated-factory idiom
            # (indexer_visitor.py:125-157 resolves `x = make()` through the
            # factory's body): a single unambiguous `return Ctor(...)` shape
            # across the function's own returns emits the same fact an
            # annotation would; anything mixed or dynamic stays un-inferred
            ret = self._inferred_return(node)
            if ret:
                self.returns_fact(full, ret, node.lineno)
            elif in_class and not node.decorator_list:
                # jedi-parity notch: an unannotated METHOD whose every
                # return is the same `return self.attr` gets a returns
                # fact on the field's key (ClassName.attr — the same
                # self-rewrite assign targets use); resolution chains it
                # through the field's ctor/annotation binding
                # (resolve.return_types_post) so `v = s.resident();
                # v.train()` resolves like an annotated getter. Decorated
                # defs are excluded: @staticmethod/@classmethod (and any
                # wrapper) make the first parameter NOT the instance, so
                # reading it as `self` would fabricate return-type facts
                attr = self._inferred_self_return(node)
                if attr:
                    self.returns_fact(
                        full, f"{self.class_stack[-1]}.{attr}", node.lineno
                    )
        # r9 A4 (jedi-parity shape C7): a @property method IS a typed
        # field of its class — attribute access ``obj.prop.m()`` must walk
        # through it exactly like a ctor-bound field, so emit the same
        # binding fact a ``self.prop = T()`` assignment would. Only when
        # the property's type is statically known (annotation or single
        # unambiguous ctor return); dynamic properties stay unresolved,
        # like the reference's jedi when inference fails.
        if in_class and any(
            (isinstance(d, ast.Name) and d.id in ("property", "cached_property"))
            or (isinstance(d, ast.Attribute) and d.attr == "cached_property")
            for d in node.decorator_list
        ):
            pret = (
                _dotted(node.returns)
                if node.returns is not None
                else self._inferred_return(node)
            )
            if pret:
                self.assign_fact(
                    f"{self.class_stack[-1]}.{node.name}", pret, node.lineno
                )
        # parameters are local bindings: annotated ones carry a usable
        # type (def f(a: Animal) → a.speak() resolves); unannotated ones
        # are poison rows so a parameter shadowing a module-global binding
        # never resolves through the global (ADVICE r2)
        args = node.args
        params = (
            list(getattr(args, "posonlyargs", ())) + args.args + args.kwonlyargs
        )
        if args.vararg is not None:
            params.append(args.vararg)
        if args.kwarg is not None:
            params.append(args.kwarg)
        for p in params:
            ann = _dotted(p.annotation) if p.annotation is not None else None
            self.assign_fact(f"{full}::{p.arg}", ann, node.lineno)
        self.func_stack.append(full)
        for child in node.body:
            self.visit(child)
        self.func_stack.pop()

    visit_FunctionDef = _visit_def
    visit_AsyncFunctionDef = _visit_def

    def visit_Assign(self, node: ast.Assign) -> None:
        expr, alias = self._type_expr(node.value)
        self._handle_assign_targets(node.targets, node, expr, alias)
        self.visit(node.value)

    def visit_AnnAssign(self, node: ast.AnnAssign) -> None:
        # an annotation is a stronger type signal than the value expression
        ann = _dotted(node.annotation)
        if ann is not None:
            expr, alias = ann, False
        else:
            expr, alias = self._type_expr(node.value)
        self._handle_assign_targets([node.target], node, expr, alias)
        if node.value is not None:
            self.visit(node.value)

    @staticmethod
    def _inferred_return(node: ast.FunctionDef | ast.AsyncFunctionDef) -> str | None:
        """The single unambiguous ``return Ctor(...)`` textual type of an
        UNANNOTATED function, or None. Conservative by design (false CALL
        edges are worse than missed ones, ADVICE r2): nested def/class/
        lambda bodies are skipped (their returns are not this function's);
        ``return None`` / bare ``return`` guards are ignored; any other
        non-constructor return value, or two different constructor names,
        abandons the inference."""
        names: set[str] = set()
        stack: list[ast.AST] = list(node.body)
        while stack:
            n = stack.pop()
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Lambda)):
                continue
            if isinstance(n, ast.Return):
                if isinstance(n.value, ast.Call) and isinstance(n.value.func, ast.Name):
                    # simple-Name constructor/factory shape only: an
                    # attribute-call return (``return pet.speak()``) is a
                    # value whose type depends on ANOTHER inference — bail
                    names.add(n.value.func.id)
                elif n.value is not None and not (
                    isinstance(n.value, ast.Constant) and n.value.value is None
                ):
                    return None
                continue
            stack.extend(ast.iter_child_nodes(n))
        return names.pop() if len(names) == 1 else None

    @staticmethod
    def _inferred_self_return(
        node: ast.FunctionDef | ast.AsyncFunctionDef,
    ) -> str | None:
        """The single unambiguous ``return self.attr`` field of an
        UNANNOTATED method, or None — the getter idiom
        (``def resident(self): return self.vet``). Same conservatism as
        _inferred_return: nested def/class/lambda bodies skipped, bare /
        None returns ignored, any other return shape (or two different
        attrs) abandons the inference. 'self' is the method's actual
        first positional parameter, whatever it is named."""
        args = node.args
        params = list(getattr(args, "posonlyargs", ())) + list(args.args)
        if not params:
            return None
        self_name = params[0].arg
        attrs: set[str] = set()
        stack: list[ast.AST] = list(node.body)
        while stack:
            n = stack.pop()
            if isinstance(
                n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Lambda)
            ):
                continue
            if isinstance(n, ast.Return):
                if (
                    isinstance(n.value, ast.Attribute)
                    and isinstance(n.value.value, ast.Name)
                    and n.value.value.id == self_name
                ):
                    attrs.add(n.value.attr)
                elif n.value is not None and not (
                    isinstance(n.value, ast.Constant) and n.value.value is None
                ):
                    return None
                continue
            stack.extend(ast.iter_child_nodes(n))
        return attrs.pop() if len(attrs) == 1 else None

    @staticmethod
    def _type_expr(value: ast.AST | None) -> tuple[str | None, bool]:
        """(textual type source, is_alias) of an assigned value:
        ``Foo(...)`` ⇒ ('Foo', False) — the name binds an INSTANCE of Foo;
        a bare Name/Attribute RHS (``a = Foo`` / ``a = mod.Foo``) ⇒
        (dotted, True) — the name ALIASES the symbol itself (reference
        capability: jedi resolves through such aliases,
        indexer_visitor.py:655-662). Alias bindings let ``a(...)`` resolve
        to the aliased callable and ``a.attr`` to the aliased symbol's
        attribute. Anything else yields no type fact (the documented
        dynamic-inference gap vs jedi)."""
        if isinstance(value, ast.Call):
            return _dotted(value.func), False
        if isinstance(value, (ast.Name, ast.Attribute)):
            d = _dotted(value)
            if d is not None and d != "self" and not d.startswith("self."):
                return d, True
        return None, False

    @staticmethod
    def _flatten_targets(targets: list[ast.expr]) -> list[ast.expr]:
        """RECURSIVE flatten of tuple/list/starred binding structure —
        `(a, (b, c)) = ...` binds all three names, not just the first
        nesting level."""
        flat: list[ast.expr] = []
        stack = list(targets)
        while stack:
            t = stack.pop()
            if isinstance(t, (ast.Tuple, ast.List)):
                stack.extend(t.elts)
            elif isinstance(t, ast.Starred):
                stack.append(t.value)
            else:
                flat.append(t)
        flat.reverse()
        return flat

    def _is_self_attr(self, t: ast.expr) -> bool:
        return (
            isinstance(t, ast.Attribute)
            and isinstance(t.value, ast.Name)
            and t.value.id == "self"
            and bool(self.class_stack)
        )

    def _poison_names(self, target: ast.expr, lineno: int) -> None:
        """Poison (type-less) binding facts for every name a non-Assign
        binding form rebinds (for/with/except/walrus/augassign targets):
        a local rebind must SHADOW any same-named module global in the
        deep pass — without the poison row the module-global fallback
        fabricates edges through the shadowed name (ADVICE r2)."""
        for t in self._flatten_targets([target]):
            if isinstance(t, ast.Name):
                key = (
                    f"{self.class_stack[-1]}.{t.id}"
                    if self.class_stack and not self.func_stack
                    else f"{self.scope}::{t.id}"
                )
                self.assign_fact(key, None, lineno)
            elif self._is_self_attr(t):
                self.assign_fact(f"{self.class_stack[-1]}.{t.attr}", None, lineno)

    def _handle_assign_targets(
        self,
        targets: list[ast.expr],
        node: ast.AST,
        type_expr: str | None = None,
        alias: bool = False,
    ) -> None:
        for t in self._flatten_targets(targets):
            # emit a binding fact for EVERY target, even with no statically
            # visible type (type_expr None → poison row): an untyped rebind
            # shadows any earlier/global binding of the same name
            if isinstance(t, ast.Name):
                if self.class_stack and not self.func_stack:
                    # class-body attribute ('class C: x: Foo') — the field
                    # key self-references use (C.x), not the scope key
                    self.assign_fact(
                        f"{self.class_stack[-1]}.{t.id}", type_expr, node.lineno,
                        alias=alias,
                    )
                    cls = self.class_stack[-1]
                    full = f"{cls}.{t.id}"
                    if full not in self.seen_fields:
                        self.seen_fields.add(full)
                        self.node_fact(full, "FIELD", t.id, node, cls=cls)
                        self.edge_fact(cls, "HAS_FIELD", full)
                else:
                    self.assign_fact(
                        f"{self.scope}::{t.id}", type_expr, node.lineno, alias=alias
                    )
                    if self.in_module_scope:
                        full = f"{self.module}.{t.id}"
                        self.node_fact(full, "GLOBAL_VARIABLE", t.id, node)
                        self.edge_fact(
                            self.module, "CONTAINS", full, assoc="GLOBAL_VARIABLE"
                        )
            elif self._is_self_attr(t):
                cls = self.class_stack[-1]
                self.assign_fact(f"{cls}.{t.attr}", type_expr, node.lineno, alias=alias)
                full = f"{cls}.{t.attr}"
                if full not in self.seen_fields:
                    self.seen_fields.add(full)
                    self.node_fact(full, "FIELD", t.attr, node, cls=cls)
                    self.edge_fact(cls, "HAS_FIELD", full)
            else:
                # complex target (subscript/attribute-chain): no binding,
                # but its subexpressions may contain refs — cache[k()] = v
                self.visit(t)

    # --- non-Assign binding forms: poison the rebinding (ADVICE r2) -------

    def _visit_for(self, node: ast.For | ast.AsyncFor) -> None:
        self._poison_names(node.target, node.lineno)
        self.generic_visit(node)

    visit_For = _visit_for
    visit_AsyncFor = _visit_for

    def _visit_with(self, node: ast.With | ast.AsyncWith) -> None:
        for item in node.items:
            if item.optional_vars is not None:
                self._poison_names(item.optional_vars, node.lineno)
        self.generic_visit(node)

    visit_With = _visit_with
    visit_AsyncWith = _visit_with

    def visit_ExceptHandler(self, node: ast.ExceptHandler) -> None:
        if node.name:
            key = (
                f"{self.class_stack[-1]}.{node.name}"
                if self.class_stack and not self.func_stack
                else f"{self.scope}::{node.name}"
            )
            self.assign_fact(key, None, node.lineno)
        self.generic_visit(node)

    def visit_AugAssign(self, node: ast.AugAssign) -> None:
        self._poison_names(node.target, node.lineno)
        self.visit(node.value)

    def visit_NamedExpr(self, node: ast.NamedExpr) -> None:
        self._poison_names(node.target, node.lineno)
        self.visit(node.value)

    def visit_Call(self, node: ast.Call) -> None:
        # module-level calls suppressed (reference myClient.py:294)
        if self.func_stack or self.class_stack:
            target, key = self._ref_with_key(node.func)
            if target:
                self.ref_fact(self.scope, "CALL", target, bind_key=key)
        for arg in node.args:
            self.visit(arg)
        for kw in node.keywords:
            self.visit(kw.value)
        # nested calls in the func expression: dispatch an inner Call
        # PROPERLY (visiting only its children loses its CALL fact —
        # `get_handler()()` must record the call to get_handler), and
        # dispatch non-trivial funcs (Subscript, Lambda, BoolOp) so their
        # subtree refs are not silently dropped
        if isinstance(node.func, ast.Call):
            self.visit(node.func)
        elif isinstance(node.func, ast.Attribute):
            for child in ast.iter_child_nodes(node.func):
                self.visit(child)
        elif not isinstance(node.func, ast.Name):
            self.visit(node.func)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        if isinstance(node.ctx, ast.Load) and self.func_stack:
            target, key = self._ref_with_key(node)
            if target and "." in target:
                self.ref_fact(self.scope, "USES", target, bind_key=key)
        self.generic_visit(node)

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load) and self.func_stack:
            self.ref_fact(self.scope, "USES", node.id)

    def _ref_target(self, expr: ast.AST) -> str | None:
        return self._ref_with_key(expr)[0]

    def _ref_with_key(self, expr: ast.AST) -> tuple[str | None, str | None]:
        """(textual target, instance-binding key). 'self.x' is rewritten
        against the enclosing class (reference D10 local naming /
        deep-indexer self resolution). The binding key names the slot whose
        assigned TYPE could resolve this target in the deep pass:
        ``scope::head`` for a local/global variable head, ``Class.attr``
        for a ``self.attr.…`` chain.

        r9 (A4 chain shapes): call-chained refs — ``self.engine.gauge().
        read``, ``make_garage().car.drive`` — render with '()' marking
        the call links (_dotted_chain; the deep walker resolves those
        segments through the return-type table). A chain whose HEAD is a
        call gets a synthetic slot: the key names the call expression
        itself and a synthetic assign fact binds it to the callee, so the
        existing first-pass machinery types it exactly like ``tmp = f();
        tmp.rest`` without the temporary existing in source."""
        dotted = _dotted(expr)
        if dotted is None:
            dotted = _dotted_chain(expr)
            if dotted is None:
                return None, None
        if dotted == "self":
            return None, None
        if dotted.startswith("self.") and self.class_stack:
            cls = self.class_stack[-1]
            parts = dotted.split(".")
            if len(parts) < 3:
                return f"{cls}.{dotted[5:]}", None
            first = parts[1]
            key = f"{cls}.{first}"
            if first.endswith("()"):
                # self.helper().x — the slot is the call result; bind it
                # to the method itself (full name resolves via sym, then
                # through the return-type table)
                self._synthetic_assign(key, f"{cls}.{first[:-2]}", expr)
            return f"{cls}.{dotted[5:]}", key
        # bare names get a binding key too: a call THROUGH an alias
        # (``Beast = Animal; Beast(...)``) needs the deep pass to look up
        # scope::Beast. Harmless for non-alias bindings — the overlay's
        # equality rewrite is gated on the ALIAS flag, so ``pet = Animal();
        # pet`` never rewrites the bare instance name to its class.
        head = dotted.split(".")[0]
        if head.endswith("()") and "." in dotted:
            # f().rest — the head IS the call: the slot names the call
            # expression and the synthetic binding types it by f's return
            key = f"{self.scope}::{head}"
            self._synthetic_assign(key, head[:-2], expr)
            return dotted, key
        key = f"{self.scope}::{head}"
        if "()" in dotted:
            # a.b().rest — 'a' may be a VARIABLE (the scope::a binding +
            # the walker's return-type hop resolve it) or a MODULE alias
            # (no binding exists; only the call-prefix slot can type it:
            # 'scope::pe.build()' bound to 'pe.build', which steps 1-4
            # resolve through the import). Emit the slot unconditionally;
            # the overlay consults it ONLY when both the local and the
            # module-global keys miss, so variable shadowing is untouched.
            prefix = dotted[: dotted.index("()") + 2]
            self._synthetic_assign(
                f"{self.scope}::{prefix}", prefix[:-2], expr
            )
        return dotted, key

    def _synthetic_assign(self, key: str, callee: str, expr: ast.AST) -> None:
        """One synthetic binding fact per (file, slot): the call-result
        slot ``key`` is typed by ``callee``'s return (annotation,
        inferred ctor shape, or getter field — whatever return_types_post
        knows). Non-alias, so the bare-name equality rewrite never
        fires."""
        if key in self._synth_slots:
            return
        self._synth_slots.add(key)
        self.assign_fact(key, callee, getattr(expr, "lineno", 0))

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            self.import_fact(
                a.name, None, a.asname or a.name.split(".")[0], False, node.lineno
            )

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        # relative-import resolution against the file's package
        # (reference get_module_name, ast_utils.py:64-95)
        if node.level:
            pkg_parts = self.module.split(".")
            # level 1 = current package; for a module (not __init__) drop the
            # module segment first
            is_init = self.path.endswith("__init__.py")
            base = pkg_parts if is_init else pkg_parts[:-1]
            if node.level > 1:
                cut = len(base) - (node.level - 1)
                if cut < 0:
                    # more dots than package depth: invalid in Python —
                    # emit nothing rather than resolving against a wrong
                    # suffix of the package path
                    return
                base = base[:cut]
            target = ".".join(base + ([node.module] if node.module else []))
        else:
            target = node.module or ""
        if not target:
            return
        for a in node.names:
            if a.name == "*":
                self.import_fact(target, "*", None, True, node.lineno)
            else:
                self.import_fact(target, a.name, a.asname or a.name, False, node.lineno)


def _extract_one(path: str, content: str) -> list[dict[str, Any]]:
    ex = _Extractor(path, content)
    try:
        tree = ast.parse(content)
    except SyntaxError as e:  # reference records error tokens and moves on
        f = ex._base()
        f.update(fact="error", full_name=ex.module, file_path=path,
                 module=ex.module, name=f"SyntaxError: {e.msg} (line {e.lineno})")
        return [f]
    except (ValueError, RecursionError) as e:
        # ast.parse also raises ValueError (NUL bytes) and RecursionError
        # (pathological nesting) — one bad file must NEVER fail the job
        f = ex._base()
        f.update(fact="error", full_name=ex.module, file_path=path,
                 module=ex.module, name=f"{type(e).__name__}: {e}")
        return [f]
    try:
        ex.run(tree)
    except RecursionError as e:  # visitor depth on hostile nesting
        f = ex._base()
        f.update(fact="error", full_name=ex.module, file_path=path,
                 module=ex.module, name=f"RecursionError: {e}")
        return [f]
    return ex.facts


def extract_facts(files_df):
    """files(path, content) → facts DataFrame (FACTS_SCHEMA) via
    mapInPandas. Arrow-batched; one Python worker per partition."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict[str, Any]] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_extract_one(path, content))
            yield pd.DataFrame(rows, columns=_COLS) if rows else pd.DataFrame(
                {c: [] for c in _COLS}
            )

    return files_df.mapInPandas(batches, schema=FACTS_SCHEMA)
