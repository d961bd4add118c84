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
