"""Manifest-based incremental snapshot (VERDICT r5 item 4): an update
rewrites only the file-hash buckets containing affected files (plus the
null-file placeholder bucket), records a (version, affected) manifest
entry, and the read side re-derives EXACT version arrays by folding the
manifest — asserted equal to the in-memory merged frames, the hard
round-trip gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.operators.incremental import affected_files
from codegraphdb_spark.sources.repo import files_from_pairs
from codegraphdb_spark import mini_repo


def _assert_frames_equal(a, b, label):
    for x, y, d in ((a, b, "a-b"), (b, a, "b-a")):
        diff = x.exceptAll(y)
        assert diff.isEmpty(), f"{label} {d}: {diff.limit(3).collect()}"


@pytest.fixture()
def built(spark):
    eng = GraphEngine(spark)
    nodes, edges, facts = eng.build(
        files_from_pairs(spark, mini_repo.V1 + mini_repo.DEEP_V1), "v1"
    )
    return eng, nodes.localCheckpoint(), edges.localCheckpoint(), facts


def test_incremental_snapshot_round_trip(spark, tmp_path, built):
    eng, nodes, edges, facts = built
    base = str(tmp_path / "snap")
    eng.write_snapshot_incremental_base(nodes, edges, base)

    # update one file, persist via the incremental writer
    change_list = list(mini_repo.CHANGE_LIST)
    changed = files_from_pairs(spark, mini_repo.V2_CHANGED_ONLY)
    n2, e2, facts2 = eng.update_version_pruned(
        nodes, edges, facts, changed, change_list, "v2"
    )
    n2 = n2.localCheckpoint()
    e2 = e2.localCheckpoint()
    aff = [r["file_path"] for r in affected_files(facts2, facts, change_list).collect()]
    eng.write_snapshot_update(n2, e2, base, "v2", aff)

    rn, re_ = eng.read_snapshot_incremental(base)
    assert sorted(rn.columns) == sorted(n2.columns)
    assert sorted(re_.columns) == sorted(e2.columns)
    _assert_frames_equal(
        rn.select(*sorted(rn.columns)), n2.select(*sorted(n2.columns)), "nodes"
    )
    _assert_frames_equal(
        re_.select(*sorted(re_.columns)), e2.select(*sorted(e2.columns)), "edges"
    )


def test_incremental_snapshot_two_chained_updates(spark, tmp_path, built):
    """Two updates on top of one base: the manifest folds in order and the
    second update's rewritten buckets carry already-exact arrays through
    the first entry's idempotent union."""
    eng, nodes, edges, facts = built
    base = str(tmp_path / "snap2")
    eng.write_snapshot_incremental_base(nodes, edges, base)

    cur_n, cur_e, cur_f = nodes, edges, facts
    all_aff: set[str] = set()
    for i, ver in enumerate(["v2", "v3"]):
        change_list = list(mini_repo.CHANGE_LIST)
        changed = files_from_pairs(
            spark,
            [
                (p, c + f"\nEXTRA_{i} = {i}\n")
                for p, c in mini_repo.V2_CHANGED_ONLY
            ],
        )
        n2, e2, f2 = eng.update_version_pruned(
            cur_n, cur_e, cur_f, changed, change_list, ver
        )
        n2 = n2.localCheckpoint()
        e2 = e2.localCheckpoint()
        aff = [
            r["file_path"]
            for r in affected_files(f2, cur_f, change_list).collect()
        ]
        eng.write_snapshot_update(n2, e2, base, ver, aff)
        all_aff.update(aff)
        cur_n, cur_e, cur_f = n2, e2, f2

    rn, re_ = eng.read_snapshot_incremental(base)
    _assert_frames_equal(
        rn.select(*sorted(rn.columns)), cur_n.select(*sorted(cur_n.columns)), "nodes"
    )
    _assert_frames_equal(
        re_.select(*sorted(re_.columns)), cur_e.select(*sorted(cur_e.columns)), "edges"
    )
    # the unaffected-majority rows really were carried by the manifest,
    # not rewritten: stored arrays for files outside every affected set
    # (and outside their hash buckets) must lack v3. Bucket collisions can
    # legitimately rewrite an unaffected file sharing a bucket with an
    # affected one, so exclude those buckets from the check.
    stored = spark.read.parquet(f"{base}/nodes")
    aff_buckets = {
        r["fb"]
        for r in spark.createDataFrame(
            [(p,) for p in sorted(all_aff)], "file_path string"
        )
        .select(GraphEngine._fbucket(F.col("file_path")).alias("fb"))
        .distinct()
        .collect()
    }
    unaff = stored.filter(
        F.col("file_path").isNotNull()
        & ~F.col("file_path").isin(sorted(all_aff))
        & ~F.col("fb").isin(sorted(aff_buckets))
    )
    assert unaff.count() > 0, "fixture too small to exercise carried rows"
    with_v3 = unaff.filter(F.array_contains("versions", "v3")).count()
    assert with_v3 == 0, "unaffected rows were rewritten with new stamps"


def test_fbucket_py_matches_spark_column(spark):
    """write_snapshot_update derives its rewrite-bucket set driver-side
    (engine._fbucket_py / _xxh64) — it must be BIT-identical to the
    executor-side _fbucket column for every path shape, or an update
    would rewrite the wrong buckets and silently duplicate rows."""
    import random
    import string

    random.seed(7)
    samples = (
        ["", "a", "pkg00000/core.py", "日本語/路径.py", "x" * 31, "y" * 32, "z" * 33]
        + [
            "".join(
                random.choices(string.printable, k=random.randint(0, 200))
            )
            for _ in range(200)
        ]
    )
    df = spark.createDataFrame([(s,) for s in samples], "p string")
    rows = df.select("p", GraphEngine._fbucket(F.col("p")).alias("fb")).collect()
    for r in rows:
        assert GraphEngine._fbucket_py(r["p"]) == r["fb"], repr(r["p"])
    assert GraphEngine._fbucket_py(None) == -1


def test_partition_migration_leaves_no_stale_rows(spark, tmp_path):
    """A row migrating OUT of its (kind, fb) partition — here a v1
    function re-declared as a v2 class — empties the old partition;
    dynamic overwrite never touches partitions absent from the written
    data, so without the explicit stale-bucket cleanup the old
    kind=function dir survives and the manifest-folded read returns a
    duplicate full_name with a stale kind."""
    import os

    eng = GraphEngine(spark)
    v1 = [("mig.py", "def thing():\n    return 1\n")]
    v2 = [("mig.py", "class thing:\n    def run(self):\n        return 2\n")]
    nodes, edges, facts = eng.build(files_from_pairs(spark, v1), "v1")
    nodes, edges = nodes.localCheckpoint(), edges.localCheckpoint()
    base = str(tmp_path / "snap_mig")
    eng.write_snapshot_incremental_base(nodes, edges, base)

    n2, e2, facts2 = eng.update_version_pruned(
        nodes, edges, facts, files_from_pairs(spark, v2), ["mig.py"], "v2"
    )
    n2, e2 = n2.localCheckpoint(), e2.localCheckpoint()
    aff = [r["file_path"] for r in affected_files(facts2, facts, ["mig.py"]).collect()]
    eng.write_snapshot_update(n2, e2, base, "v2", aff)

    rn, re_ = eng.read_snapshot_incremental(base)
    _assert_frames_equal(
        rn.select(*sorted(rn.columns)), n2.select(*sorted(n2.columns)), "nodes"
    )
    _assert_frames_equal(
        re_.select(*sorted(re_.columns)), e2.select(*sorted(e2.columns)), "edges"
    )
    # and the stale pre-migration row is gone from the STORED files too
    # (the rewrite pre-deletes the whole fb dir before appending)
    stored = spark.read.parquet(f"{base}/nodes")
    stale = stored.filter(
        (F.col("full_name") == "mig.thing") & (F.col("kind") == "function")
    )
    assert stale.isEmpty()
    fb = GraphEngine._fbucket_py("mig.py")
    assert os.path.exists(f"{base}/nodes/fb={fb}")
