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


def _drive_mixed(spark, snap_dir, flags):
    for i, (batch, inc) in enumerate(zip((B0, B1, B2), flags)):
        pairs = [(p, c) for p, c in batch if c is not None]
        change_list = [p for p, _ in batch]
        files = files_from_pairs(spark, pairs)
        index_batch(spark, files, change_list, snap_dir, f"s{i}", incremental=inc)


def test_layout_switch_staged_to_incremental(spark, tmp_path):
    """incremental=True over an existing staged-layout snapshot must not
    dynamic-overwrite fb= dirs into the flat table: the batch migrates via
    one full base write, and subsequent incremental reads equal the staged
    reference."""
    from codegraphdb_spark.streaming.repo_index import _is_manifest_layout

    eng = GraphEngine(spark)
    ref_dir = str(tmp_path / "ref_a")
    mix_dir = str(tmp_path / "mix_a")
    _drive(spark, ref_dir, incremental=False)
    _drive_mixed(spark, mix_dir, (False, True, True))

    assert _is_manifest_layout(spark, mix_dir)
    fn, fe = eng.read_snapshot(ref_dir)
    rn, re_ = eng.read_snapshot_incremental(mix_dir)
    _assert_equal(fn, rn, "nodes")
    _assert_equal(fe, re_, "edges")
    ff = spark.read.parquet(_facts_path(ref_dir))
    rf = eng.read_facts_incremental(_facts_path(mix_dir))
    _assert_equal(ff, rf, "facts")


def test_layout_switch_incremental_to_staged(spark, tmp_path):
    """incremental=False over a manifest-layout snapshot must read through
    the manifest fold, staged-swap flat tables, and drop the manifest —
    not leave mixed layouts or stale version arrays."""
    import os as _os

    from codegraphdb_spark.streaming.repo_index import _is_manifest_layout

    eng = GraphEngine(spark)
    ref_dir = str(tmp_path / "ref_b")
    mix_dir = str(tmp_path / "mix_b")
    _drive(spark, ref_dir, incremental=False)
    _drive_mixed(spark, mix_dir, (True, True, False))

    assert not _is_manifest_layout(spark, mix_dir)
    assert not _os.path.exists(_os.path.join(mix_dir, "_manifest"))
    fn, fe = eng.read_snapshot(ref_dir)
    rn, re_ = eng.read_snapshot(mix_dir)
    _assert_equal(fn, rn, "nodes")
    _assert_equal(fe, re_, "edges")


def test_auto_rebase_bounds_manifest(spark, tmp_path, monkeypatch):
    """A long-running incremental stream re-bases automatically once the
    manifest reaches SNAPSHOT_REBASE_MANIFEST_LEN, so the read plan's fold
    depth stays bounded — and reads stay equal to the staged reference."""
    import codegraphdb_spark.streaming.repo_index as ri

    monkeypatch.setattr(ri, "SNAPSHOT_REBASE_MANIFEST_LEN", 1)
    eng = GraphEngine(spark)
    ref_dir = str(tmp_path / "ref_c")
    inc_dir = str(tmp_path / "inc_c")
    _drive(spark, ref_dir, incremental=False)
    _drive(spark, inc_dir, incremental=True)

    # 3 batches with threshold 1: batch0 base, batch1 appends entry #0,
    # batch2 finds len==1 >= 1 and re-bases — manifest is gone again
    assert len(eng._read_manifest(inc_dir)) == 0
    fn, fe = eng.read_snapshot(ref_dir)
    rn, re_ = eng.read_snapshot_incremental(inc_dir)
    _assert_equal(fn, rn, "nodes")
    _assert_equal(fe, re_, "edges")
