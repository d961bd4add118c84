"""update_version_pruned must produce EXACTLY the same snapshot as the
full-recompile update_version — on the mini fixture (imports, re-exports,
stars, deep bindings, two versions) and on a transitive-dependency chain
where the change propagates through files that never import the changed
module directly (inheritance + factory return types two hops away).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from codegraphdb_spark import mini_repo
from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.sources.repo import files_from_pairs


def _norm_nodes(df):
    return df.withColumn("versions", F.array_sort("versions"))


def _norm_edges(df):
    return df.withColumn("versions", F.array_sort("versions"))


def _assert_same(a, b, what):
    extra = a.exceptAll(b).collect()
    missing = b.exceptAll(a).collect()
    assert not extra and not missing, (
        f"{what}: pruned-extra={extra[:5]} pruned-missing={missing[:5]}"
    )


def _build_and_compare(spark, v1_files, v2_changed, change_list):
    eng = GraphEngine(spark, small_repo=True)
    n1, e1, f1 = eng.build(files_from_pairs(spark, v1_files), "v1")
    n1 = n1.localCheckpoint()
    e1 = e1.localCheckpoint()
    changed = files_from_pairs(spark, v2_changed)

    nf, ef, _ = eng.update_version(n1, e1, f1, changed, change_list, "v2")
    np_, ep, _ = eng.update_version_pruned(n1, e1, f1, changed, change_list, "v2")

    _assert_same(
        _norm_nodes(np_).localCheckpoint(), _norm_nodes(nf).localCheckpoint(), "nodes"
    )
    _assert_same(
        _norm_edges(ep).localCheckpoint(), _norm_edges(ef).localCheckpoint(), "edges"
    )


def test_pruned_equals_full_on_mini_repo(spark):  # noqa: F811
    _build_and_compare(
        spark,
        mini_repo.V1 + mini_repo.DEEP_V1,
        mini_repo.V2_CHANGED_ONLY,
        mini_repo.CHANGE_LIST,
    )


CHAIN_V1 = [
    ("liba/__init__.py", ""),
    (
        "liba/base.py",
        "class Base:\n"
        "    def ping(self):\n        return 1\n"
        "    def gone(self):\n        return 2\n",
    ),
    ("libb/__init__.py", ""),
    (
        "libb/mid.py",
        "from liba.base import Base\n\n"
        "class Mid(Base):\n"
        "    def mid_only(self):\n        return 3\n\n"
        "def make_mid() -> Mid:\n    return Mid()\n",
    ),
    ("libc/__init__.py", ""),
    (
        "libc/user.py",
        "from libb.mid import make_mid\n\n"
        "def use():\n"
        "    x = make_mid()\n"
        "    x.ping()\n"
        "    x.gone()\n"
        "    x.mid_only()\n",
    ),
    # a bystander package that must NOT be recompiled (no import chain to liba)
    (
        "other/solo.py",
        "VALUE = 7\n\ndef standalone():\n    return VALUE\n",
    ),
]

# v2: liba.base loses gone() and gains fresh() — libc/user.py never imports
# liba directly, but its x.gone() CALL edge must disappear (x is a Mid via
# the factory return type; Mid inherits Base): the pruned path must mark
# libc affected through the libb -> liba import chain.
CHAIN_V2_CHANGED = [
    (
        "liba/base.py",
        "class Base:\n"
        "    def ping(self):\n        return 1\n"
        "    def fresh(self):\n        return 4\n",
    ),
]


def test_pruned_follows_import_chains(spark):  # noqa: F811
    _build_and_compare(spark, CHAIN_V1, CHAIN_V2_CHANGED, ["liba/base.py"])


def test_pruned_affected_set_is_pruned(spark):  # noqa: F811
    """The bystander file must be OUTSIDE the affected set (the whole point
    of pruning), while the full liba->libb->libc chain is inside."""
    from codegraphdb_spark.operators.incremental import affected_files

    eng = GraphEngine(spark, small_repo=True)
    _, _, f1 = eng.build(files_from_pairs(spark, CHAIN_V1), "v1")
    facts_new = eng.prepare_update_facts(
        f1, files_from_pairs(spark, CHAIN_V2_CHANGED), ["liba/base.py"]
    )
    aff = {
        r.file_path
        for r in affected_files(facts_new, f1, ["liba/base.py"]).collect()
    }
    assert "liba/base.py" in aff
    assert "libb/mid.py" in aff
    assert "libc/user.py" in aff
    assert "other/solo.py" not in aff


# --- adversarial scenarios ----------------------------------------------------------

SCEN_V1 = [
    ("pkg/__init__.py", "from pkg.impl import *\n"),
    (
        "pkg/impl.py",
        "class Widget:\n"
        "    def render(self):\n        return 1\n\n"
        "class Gone:\n"
        "    def bye(self):\n        return 2\n",
    ),
    (
        "app/main.py",
        "from pkg import Widget, Gone\n"
        "import missing.thing\n\n"
        "def run():\n"
        "    w = Widget()\n"
        "    w.render()\n"
        "    g = Gone()\n"
        "    g.bye()\n"
        "    missing.thing.helper()\n",
    ),
    ("lone/quiet.py", "def untouched():\n    return 0\n"),
]


def test_pruned_symbol_deletion_through_star_reexport(spark):  # noqa: F811
    """Deleting a class from a star-re-exported module must invalidate the
    consumer (app.main imports from pkg, pkg star-imports pkg.impl): the
    g = Gone() binding and g.bye() CALL edge must vanish in v2 exactly as
    the full recompile says."""
    changed = [
        (
            "pkg/impl.py",
            "class Widget:\n"
            "    def render(self):\n        return 1\n",
        ),
    ]
    _build_and_compare(spark, SCEN_V1, changed, ["pkg/impl.py"])


def test_pruned_new_module_resolves_old_unsolved(spark):  # noqa: F811
    """Adding a brand-new module that an EXISTING file already imports
    (missing.thing was unsolved in v1) must re-resolve the old file's
    references — the import-graph reachability must catch modules that
    did not exist in v1."""
    changed = [
        ("missing/__init__.py", ""),
        (
            "missing/thing.py",
            "def helper():\n    return 42\n",
        ),
    ]
    _build_and_compare(
        spark, SCEN_V1, changed, ["missing/__init__.py", "missing/thing.py"]
    )


def test_pruned_whole_file_deletion(spark):  # noqa: F811
    """A file in the change list with NO new content is a deletion: its
    symbols keep only the old version, and consumers' edges re-resolve
    (to unsolved) — identically in both paths."""
    _build_and_compare(spark, SCEN_V1, [], ["pkg/impl.py"])


# --- round-3 review: intra-package re-export behind a star import -------------

REEXPORT_STAR_V1 = [
    ("pkg/__init__.py", "from pkg.impl import Widget\n"),
    ("pkg/impl.py", "class Widget:\n    def spin(self):\n        return 1\n"),
    ("app.py", "from pkg import *\n"),
    ("other.py", "X = 1\n"),
]
REEXPORT_STAR_V2_CHANGED = [("other.py", "X = 2\n")]


def test_pruned_equals_full_with_reexport_behind_star(spark):
    """The carried re-export edge CONTAINS(pkg, pkg.impl.Widget) lies
    under pkg's dotted prefix; the pruned star-expansion must NOT treat
    it as a definition-site child of pkg (the full recompile's star pass
    sees only definition-site children), or app gains a phantom
    CONTAINS(app, pkg.impl.Widget) edge."""
    _build_and_compare(
        spark, REEXPORT_STAR_V1, REEXPORT_STAR_V2_CHANGED, ["other.py"]
    )


def test_pruned_equals_full_with_submodule_reexport(spark):
    """`from . import impl` emits a MODULE-kind re-export edge
    CONTAINS(pkg, pkg.impl) with exactly one extra dotted segment — the
    association_type discriminator (never MODULE for definition-site
    children) must keep it out of the pruned star-expansion too."""
    v1 = [
        ("pkg/__init__.py", "from . import impl\n"),
        ("pkg/impl.py", "class Widget:\n    pass\n"),
        ("app.py", "from pkg import *\n"),
        ("other.py", "X = 1\n"),
    ]
    _build_and_compare(spark, v1, [("other.py", "X = 2\n")], ["other.py"])


def test_dependent_modules_driver_vs_distributed(spark):
    """The reverse-reachability BFS must return the same affected-module
    set on both strategies: driver-side BFS (under DRIVER_CLOSURE_LIMIT)
    and the distributed frontier semi-join loop. Graph: a chain
    m0 <- m1 <- ... <- m5 (mi imports m{i-1}), a diamond onto m0, and a
    disconnected pair — seeds {m0} must reach exactly the chain + diamond,
    never the disconnected pair, on both paths."""
    from codegraphdb_spark.operators.incremental import _dependent_modules

    edges = [(f"m{i}", f"m{i-1}") for i in range(1, 6)]  # src imports dst
    edges += [("d1", "m0"), ("d2", "m0"), ("top", "d1"), ("top", "d2")]
    edges += [("iso_a", "iso_b")]
    dep = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("m0",)], "full_name string")

    expect = {f"m{i}" for i in range(1, 6)} | {"d1", "d2", "top"}
    got_driver = {
        r.full_name for r in _dependent_modules(dep, seeds).collect()
    }
    got_dist = {
        r.full_name
        for r in _dependent_modules(dep, seeds, force_distributed=True).collect()
    }
    assert got_driver == expect
    # distributed path may include the seeds themselves (caller dedups)
    assert got_dist - {"m0"} == expect
