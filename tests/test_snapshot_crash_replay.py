"""Torn-update crash window (VERDICT r7 item 7): write_snapshot_update's
contract (engine.py) is delete-then-append, non-atomic — a crash between
the bucket deletes and the appends (or after a partial append, before the
manifest entry) can leave a torn snapshot, and the documented repair is
IDEMPOTENT REPLAY of the same batch. This test kills the writer at both
points via injected hooks, replays, and asserts the folded read-back
equals the merged frames exactly — pinning the repair claim instead of
trusting the docstring."""

from __future__ import annotations

import pytest

from codegraphdb_spark import mini_repo
from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.operators.incremental import affected_files
from codegraphdb_spark.sources.repo import files_from_pairs


def _assert_frames_equal(a, b, label):
    for x, y, d in ((a, b, "a-b"), (b, a, "b-a")):
        diff = x.exceptAll(y)
        assert diff.isEmpty(), f"{label} {d}: {diff.limit(3).collect()}"


@pytest.fixture()
def update_ready(spark, tmp_path):
    """Base snapshot persisted + one merged update (frames and affected
    list) ready to be written."""
    eng = GraphEngine(spark)
    nodes, edges, facts = eng.build(
        files_from_pairs(spark, mini_repo.V1 + mini_repo.DEEP_V1), "v1"
    )
    nodes, edges = nodes.localCheckpoint(), edges.localCheckpoint()
    base = str(tmp_path / "snap_crash")
    eng.write_snapshot_incremental_base(nodes, edges, base)

    change_list = list(mini_repo.CHANGE_LIST)
    changed = files_from_pairs(spark, mini_repo.V2_CHANGED_ONLY)
    n2, e2, facts2 = eng.update_version_pruned(
        nodes, edges, facts, changed, change_list, "v2"
    )
    n2, e2 = n2.localCheckpoint(), e2.localCheckpoint()
    aff = [
        r["file_path"]
        for r in affected_files(facts2, facts, change_list).collect()
    ]
    return eng, n2, e2, base, aff


def _assert_replay_repairs(spark, eng, n2, e2, base, aff):
    """Replay the SAME batch after the injected crash, then hard-gate the
    folded read against the merged frames and the stored files against
    duplication (a torn append replayed on top of surviving files would
    show up as doubled rows before it would show up as wrong fold)."""
    eng.write_snapshot_update(n2, e2, base, "v2", aff)
    rn, re_ = eng.read_snapshot_incremental(base)
    _assert_frames_equal(
        rn.select(*sorted(rn.columns)), n2.select(*sorted(n2.columns)), "nodes"
    )
    _assert_frames_equal(
        re_.select(*sorted(re_.columns)), e2.select(*sorted(e2.columns)), "edges"
    )
    stored = spark.read.parquet(f"{base}/nodes")
    dupes = (
        stored.groupBy("full_name", "kind", "file_path")
        .count()
        .filter("count > 1")
    )
    assert dupes.isEmpty(), f"duplicated stored rows: {dupes.limit(3).collect()}"


def test_crash_between_delete_and_append_replay_repairs(
    spark, update_ready, monkeypatch
):
    eng, n2, e2, base, aff = update_ready
    real = GraphEngine._delete_rewrite_buckets
    calls = {"n": 0}

    def dying(self, table_path, rewrite):
        real(self, table_path, rewrite)
        calls["n"] += 1
        if calls["n"] == 2:  # both bucket trees deleted, nothing appended
            raise RuntimeError("injected crash: after deletes, before appends")

    monkeypatch.setattr(GraphEngine, "_delete_rewrite_buckets", dying)
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.write_snapshot_update(n2, e2, base, "v2", aff)
    monkeypatch.setattr(GraphEngine, "_delete_rewrite_buckets", real)

    # torn state is REAL at this point: the read side must not silently
    # look whole — the rewritten buckets are gone and no manifest entry
    # exists, so the fold sees v1-only data (a stale-but-consistent view);
    # the repair contract is replay, which we now exercise
    _assert_replay_repairs(spark, eng, n2, e2, base, aff)


def test_crash_after_appends_before_manifest_replay_repairs(
    spark, update_ready, monkeypatch
):
    eng, n2, e2, base, aff = update_ready
    real = GraphEngine._append_manifest_entry

    def dying(self, path, new_version, affected):
        raise RuntimeError("injected crash: appends done, manifest missing")

    monkeypatch.setattr(GraphEngine, "_append_manifest_entry", dying)
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.write_snapshot_update(n2, e2, base, "v2", aff)
    monkeypatch.setattr(GraphEngine, "_append_manifest_entry", real)

    # replay must first RE-DELETE the appended-but-unmanifested buckets;
    # if it appended on top, every rewritten row would be doubled
    _assert_replay_repairs(spark, eng, n2, e2, base, aff)
