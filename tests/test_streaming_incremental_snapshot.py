"""Streaming indexer's incremental persistence mode: the manifest-snapshot
path (O(affected-buckets) disk traffic per micro-batch) must produce a
snapshot READ-EQUAL to the default staged-full-write path over the same
batch sequence — build, modify, add, delete — including facts carry-over
(the next batch's update reads what the previous one wrote)."""

from __future__ import annotations

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.sources.repo import files_from_pairs
from codegraphdb_spark.streaming.repo_index import _facts_path, index_batch


B0 = [
    ("pkg/__init__.py", ""),
    ("pkg/base.py", "class Base:\n    def ping(self):\n        return 1\n"),
    ("pkg/user.py", "from pkg.base import Base\n\nclass User(Base):\n    pass\n"),
    ("pkg/tmp.py", "def scratch():\n    return 0\n"),
]
B1 = [  # modify base.py, add fresh.py
    ("pkg/base.py", "class Base:\n    def ping(self):\n        return 2\n"),
    ("pkg/fresh.py", "def newcomer():\n    return 7\n"),
]
B2 = [("pkg/tmp.py", None)]  # delete tmp.py


def _drive(spark, snap_dir, incremental):
    for i, batch in enumerate((B0, B1, B2)):
        pairs = [(p, c) for p, c in batch if c is not None]
        change_list = [p for p, _ in batch]
        files = files_from_pairs(spark, pairs)
        index_batch(
            spark, files, change_list, snap_dir, f"s{i}", incremental=incremental
        )


def _assert_equal(a, b, label):
    cols = sorted(a.columns)
    for x, y, d in ((a, b, ">"), (b, a, "<")):
        diff = x.select(*cols).exceptAll(y.select(*cols))
        assert diff.isEmpty(), f"{label} {d}: {diff.limit(3).collect()}"


def test_incremental_mode_read_equals_staged_full_write(spark, tmp_path):
    eng = GraphEngine(spark)
    full_dir = str(tmp_path / "full")
    inc_dir = str(tmp_path / "inc")
    _drive(spark, full_dir, incremental=False)
    _drive(spark, inc_dir, incremental=True)

    fn, fe = eng.read_snapshot(full_dir)
    rn, re_ = eng.read_snapshot_incremental(inc_dir)
    _assert_equal(fn, rn, "nodes")
    _assert_equal(fe, re_, "edges")

    # facts carry-over: the incremental facts dir equals the staged one
    ff = spark.read.parquet(_facts_path(full_dir))
    rf = eng.read_facts_incremental(_facts_path(inc_dir))
    _assert_equal(ff, rf, "facts")
    # the deleted file's facts really are gone (the explicit empty-bucket
    # deletion path)
    assert rf.filter(rf.file_path == "pkg/tmp.py").isEmpty()
