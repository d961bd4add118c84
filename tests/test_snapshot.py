"""Snapshot persistence: partitioned parquet layout + round-trip fidelity
(A6 sink / scale-hygiene of SURVEY §7.2 step 7)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.sources.repo import files_from_pairs
from tests.fixtures import mini_repo


@pytest.fixture(scope="module")
def built(spark):
    eng = GraphEngine(spark)
    nodes, edges, _ = eng.build(files_from_pairs(spark, mini_repo.V1), "v1")
    return eng, nodes.localCheckpoint(), edges.localCheckpoint()


def test_snapshot_round_trip(built, tmp_path):
    eng, nodes, edges, = built
    path = str(tmp_path / "snap")
    eng.write_snapshot(nodes, edges, path)
    n2, e2 = eng.read_snapshot(path)

    def key_n(df):
        return {
            (r["full_name"], r["kind"], tuple(sorted(r["versions"])))
            for r in df.collect()
        }

    def key_e(df):
        return {(r["src"], r["dst"], r["rel_type"]) for r in df.collect()}

    assert key_n(nodes) == key_n(n2)
    assert key_e(edges) == key_e(e2)


def test_snapshot_partition_layout(built, tmp_path):
    """kind=/rel_type= directory partitioning → partition pruning for the
    reference's label-filtered queries (C2)."""
    eng, nodes, edges = built
    path = str(tmp_path / "snap2")
    eng.write_snapshot(nodes, edges, path)
    kinds = {d for d in os.listdir(f"{path}/nodes") if d.startswith("kind=")}
    assert "kind=CLASS" in kinds and "kind=MODULE" in kinds
    rels = {d for d in os.listdir(f"{path}/edges") if d.startswith("rel_type=")}
    assert "rel_type=HAS_METHOD" in rels and "rel_type=INHERITS" in rels


def test_kind_filter_prunes_partitions(built, tmp_path, spark):
    eng, nodes, edges = built
    path = str(tmp_path / "snap3")
    eng.write_snapshot(nodes, edges, path)
    n, _ = eng.read_snapshot(path)
    plan = (
        n.filter(F.col("kind") == "CLASS")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition filter present (pruning), not a post-scan filter on kind
    assert "PartitionFilters" in plan and "kind" in plan.split("PartitionFilters")[1][:200]


def test_atomic_snapshot_swap(spark, tmp_path):
    """atomic=True stages both tables then swaps: overwriting an existing
    snapshot leaves no .stage residue, the new content is fully visible,
    and a leftover .stage dir from a crashed writer is cleared."""
    import os

    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.sources.repo import files_from_pairs
    from tests.fixtures import mini_repo

    eng = GraphEngine(spark)
    nodes, edges, _ = eng.build(files_from_pairs(spark, mini_repo.V1), "v1")
    path = str(tmp_path / "snap")
    eng.write_snapshot(nodes, edges, path, atomic=True)
    n1, e1 = eng.read_snapshot(path)
    assert n1.count() == nodes.count() and e1.count() == edges.count()

    # simulate a crashed writer's residue, then overwrite atomically
    os.makedirs(path + ".stage/nodes", exist_ok=True)
    with open(path + ".stage/nodes/garbage", "w") as fh:
        fh.write("junk")
    eng.write_snapshot(nodes, edges, path, atomic=True)
    assert not os.path.exists(path + ".stage")
    n2, e2 = eng.read_snapshot(path)
    assert n2.count() == nodes.count() and e2.count() == edges.count()


def test_optimistic_generation_commits(built, tmp_path):
    from codegraphdb_spark.engine import (
        ConcurrentWriteError,
        read_snapshot_generation,
    )

    eng, nodes, edges = built
    path = str(tmp_path / "gen_snap")
    assert read_snapshot_generation(eng.spark, path) == 0
    eng.write_snapshot(nodes, edges, path, atomic=True, expected_generation=0)
    assert read_snapshot_generation(eng.spark, path) == 1
    eng.write_snapshot(nodes, edges, path, atomic=True, expected_generation=1)
    assert read_snapshot_generation(eng.spark, path) == 2
    # a writer whose base is stale must NOT commit, and the live snapshot
    # must be untouched
    before = eng.read_snapshot(path)[0].count()
    with pytest.raises(ConcurrentWriteError, match="generation 2"):
        eng.write_snapshot(
            nodes.limit(1), edges, path, atomic=True, expected_generation=0
        )
    assert read_snapshot_generation(eng.spark, path) == 2
    assert eng.read_snapshot(path)[0].count() == before


def test_commit_lock_blocks_and_stale_break(built, tmp_path):
    from codegraphdb_spark.engine import ConcurrentWriteError

    eng, nodes, edges = built
    path = str(tmp_path / "lock_snap")
    eng.write_snapshot(nodes, edges, path, atomic=True, expected_generation=0)
    # simulate a writer that died holding the lock
    os.makedirs(path, exist_ok=True)
    open(os.path.join(path, "_COMMIT_LOCK"), "w").close()
    with pytest.raises(ConcurrentWriteError, match="commit lock"):
        eng.write_snapshot(nodes, edges, path, atomic=True, expected_generation=1)
    # explicit stale-break is an operator decision, then the commit lands
    eng.write_snapshot(
        nodes, edges, path, atomic=True, expected_generation=1,
        break_stale_after_s=0.0,
    )
    from codegraphdb_spark.engine import read_snapshot_generation

    assert read_snapshot_generation(eng.spark, path) == 2
    assert not os.path.exists(os.path.join(path, "_COMMIT_LOCK"))


def test_expected_generation_requires_atomic(built, tmp_path):
    eng, nodes, edges = built
    with pytest.raises(ValueError, match="atomic"):
        eng.write_snapshot(
            nodes, edges, str(tmp_path / "x"), expected_generation=0
        )
