"""Incremental versioning golden tests (reference lifecycle 3.3,
update_version.py): v1 → v2 changes only pkgb/dog.py; FIXTURES.md golden
expectations: v2 stamps versions on every node whose file_path is outside
the change list; changed-file nodes re-extract under v2."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.sources.repo import files_from_pairs
from tests.fixtures import mini_repo


@pytest.fixture(scope="module")
def versioned(spark):
    eng = GraphEngine(spark)
    files_v1 = files_from_pairs(spark, mini_repo.V1)
    n1, e1, f1 = eng.build(files_v1, "v1")
    n1, e1 = n1.cache(), e1.cache()
    changed = files_from_pairs(spark, mini_repo.V2_CHANGED_ONLY)
    n2, e2, f2 = eng.update_version(
        n1, e1, f1, changed, mini_repo.CHANGE_LIST, "v2"
    )
    return eng, n1, e1, n2.cache(), e2.cache()


def _versions(nodes, full_name):
    row = nodes.filter(F.col("full_name") == full_name).first()
    return sorted(row["versions"]) if row else None


def test_unchanged_nodes_stamped_both_versions(versioned):
    _, _, _, n2, _ = versioned
    assert _versions(n2, "pkga.base.Animal") == ["v1", "v2"]
    assert _versions(n2, "pkga.util.helper") == ["v1", "v2"]


def test_changed_file_nodes_reextracted(versioned):
    _, _, _, n2, _ = versioned
    # Dog existed in v1 and still exists in v2 → both versions (reference:
    # add_node matches full_name and adds the new task label)
    assert _versions(n2, "pkgb.dog.Dog") == ["v1", "v2"]
    # method added in v2 only
    assert _versions(n2, "pkgb.dog.Dog.roll") == ["v2"]


def test_new_method_closure_propagates(versioned):
    """Dog.roll (new in v2) must reach Puppy via the E1 closure recomputed
    for v2."""
    _, _, _, _, e2 = versioned
    hm = {
        r["dst"]
        for r in e2.filter(
            (F.col("rel_type") == "HAS_METHOD")
            & (F.col("src") == "pkgb.puppy.Puppy")
        ).collect()
    }
    assert "pkgb.dog.Dog.roll" in hm


def test_v1_view_unchanged_after_update(versioned):
    """Version-scoped read of v1 returns exactly the v1 graph (C9)."""
    _, n1, _, n2, _ = versioned
    v1_names = {r["full_name"] for r in n1.collect()}
    v1_view = {
        r["full_name"]
        for r in n2.filter(F.array_contains("versions", "v1")).collect()
    }
    assert v1_view == v1_names
    assert "pkgb.dog.Dog.roll" not in v1_view


def test_clear_version_cascades(versioned):
    """B5: deleting v1 leaves a pure-v2 graph; edges cascade (DETACH)."""
    eng, _, _, n2, e2 = versioned
    n, e = eng.clear_version(n2, e2, "v1")
    remaining = {tuple(r) for r in n.select("full_name").collect()}
    # v2-only node survives; versions arrays contain only v2
    assert ("pkgb.dog.Dog.roll",) in remaining
    assert n.filter(F.array_contains("versions", "v1")).isEmpty()
    # every edge endpoint still exists (cascade worked)
    node_names = n.select(F.col("full_name")).distinct()
    dangling = (
        e.select(F.col("src").alias("full_name"))
        .unionByName(e.select(F.col("dst").alias("full_name")))
        .distinct()
        .join(node_names, "full_name", "left_anti")
    )
    assert dangling.isEmpty()
