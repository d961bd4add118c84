"""Dotted-name / path scalar functions (reference D4–D10) as pure Column
expressions — all codegen'd, no UDFs.

- module name from path (ast_utils.py:38-61; shallow_indexer.py:549-586):
  strip ``.py``, ``/`` → ``.``, drop trailing ``__init__``.
- module name to path (ast_utils.py:104-112).
- name-hierarchy display join / parent (index_utils.py:84-112).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def module_name_from_path(path: Column | str) -> Column:
    """'pkg/sub/mod.py' → 'pkg.sub.mod'; 'pkg/__init__.py' → 'pkg'.

    Column twin of the extractor's ``_module_name`` (D4) — empty path
    segments are FILTERED like the Python version ('a//b.py' → 'a.b',
    never 'a..b'); asserted equivalent in tests/test_functions.py."""
    p = F.col(path) if isinstance(path, str) else path
    no_ext = F.regexp_replace(p, r"\.py$", "")
    no_init = F.regexp_replace(no_ext, r"(^|/)__init__$", "")
    parts = F.filter(F.split(no_init, "/"), lambda x: x != "")
    return F.array_join(parts, ".")


def module_name_to_path(module: Column | str, root: str = "") -> Column:
    """'pkg.sub.mod' → '<root>/pkg/sub/mod.py'."""
    m = F.col(module) if isinstance(module, str) else module
    rel = F.concat(F.regexp_replace(m, r"\.", "/"), F.lit(".py"))
    return F.concat(F.lit(root.rstrip("/") + "/"), rel) if root else rel


def parent_name(full_name: Column | str) -> Column:
    """'pkg.mod.Class.method' → 'pkg.mod.Class' (all-but-last join,
    index_utils.py:106-112); single-element names → NULL."""
    c = F.col(full_name) if isinstance(full_name, str) else full_name
    elems = F.split(c, r"\.")
    return F.when(
        F.size(elems) > 1,
        F.array_join(F.slice(elems, 1, F.size(elems) - 1), "."),
    )


def strip_prefix(path: Column | str, prefix: str) -> Column:
    """Repo-root relativization (reference D9, myClient.py:34-38 and the
    bulk retrofit B8, graphDB.py:155-174)."""
    import re

    p = F.col(path) if isinstance(path, str) else path
    pre = prefix if prefix.endswith("/") else prefix + "/"
    return F.regexp_replace(p, "^" + re.escape(pre), "")
