"""Standing-table GC (VERDICT r8 item 8): drop warehouse dirs whose tag
matches no kept corpus, keep everything attached or young enough, and
never touch non-standing tables."""

from __future__ import annotations

import os
import time

import pytest

import tools.standing_gc as gc_mod


def _mk(warehouse, name, age_days=0.0):
    p = os.path.join(warehouse, name)
    os.makedirs(p)
    with open(os.path.join(p, "part-0.parquet"), "w") as fh:
        fh.write("x")
    if age_days:
        old = time.time() - age_days * 86400
        os.utime(p, (old, old))
    return p


def test_keep_by_corpus_tag(tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    keep_dir = "/data/corpus_a"
    tag = gc_mod.corpus_tag(keep_dir)
    kept_tables = [f"mh_sigs_{tag}", f"inc_bands_{tag}", f"ovl_post_{tag}"]
    stale = ["mh_sigs_deadbeef", "sim60_cafebabe", "inc_ivf_cent_01234567"]
    other = ["my_fact_table", "mh_sigs_notahextag"]
    for n in kept_tables + stale + other:
        _mk(wh, n)

    res = gc_mod.collect_garbage(wh, keep_sf_dirs=[keep_dir])
    assert sorted(res["dropped"]) == sorted(stale)
    assert sorted(res["kept"]) == sorted(kept_tables)
    for n in kept_tables + other:
        assert os.path.isdir(os.path.join(wh, n)), n
    for n in stale:
        assert not os.path.exists(os.path.join(wh, n)), n


def test_age_based(tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    _mk(wh, "mh_sigs_00000001", age_days=10)
    _mk(wh, "mh_sigs_00000002", age_days=0.1)
    res = gc_mod.collect_garbage(wh, max_age_days=5)
    assert res["dropped"] == ["mh_sigs_00000001"]
    assert res["kept"] == ["mh_sigs_00000002"]


def test_dry_run_touches_nothing(tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    _mk(wh, "sim60_deadbeef")
    res = gc_mod.collect_garbage(wh, keep_sf_dirs=[], dry_run=True)
    assert res["dropped"] == ["sim60_deadbeef"]
    assert os.path.isdir(os.path.join(wh, "sim60_deadbeef"))


def test_no_criteria_is_a_noop(tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    _mk(wh, "sim60_deadbeef")
    res = gc_mod.collect_garbage(wh)
    assert res["dropped"] == []


def test_tag_matches_build_site_convention(tmp_path, spark):
    """The GC's tag derivation must stay in lockstep with the build
    sites: build a real standing table for a tmp corpus, then GC with
    that corpus kept (survives) and without it (dropped)."""
    import shutil as sh

    fixture = tmp_path / "corpus"
    fixture.mkdir()
    sh.copy(
        "/root/testdata/sf0.001/documents.parquet",
        fixture / "documents.parquet",
    )
    sf_dir = str(fixture)
    from codegraphdb_spark.queries.text import _standing_minhash_sigs

    _standing_minhash_sigs(spark, sf_dir)
    wh = spark.conf.get("spark.sql.warehouse.dir")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    name = f"mh_sigs_{gc_mod.corpus_tag(sf_dir)}"
    assert os.path.isdir(os.path.join(wh, name)), "build-site tag mismatch"

    res = gc_mod.collect_garbage(wh, keep_sf_dirs=[sf_dir], dry_run=True)
    assert name in res["kept"]
    res = gc_mod.collect_garbage(wh, keep_sf_dirs=["/somewhere/else"], dry_run=True)
    assert name in res["dropped"]

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    sh.rmtree(os.path.join(wh, name), ignore_errors=True)


def test_keep_is_unconditionally_protective(tmp_path):
    """ADVICE r9: --keep + --max-age-days used to AND the criteria, so an
    explicitly kept corpus older than the age bound was silently deleted
    (and rebuilt next session). Keep now wins over age; age binds only
    the non-kept tables."""
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    keep_dir = "/data/corpus_a"
    tag = gc_mod.corpus_tag(keep_dir)
    old_kept = _mk(wh, f"mh_sigs_{tag}", age_days=30)
    old_stray = _mk(wh, "mh_sigs_deadbeef", age_days=30)
    young_stray = _mk(wh, "sim60_cafebabe", age_days=0.1)

    res = gc_mod.collect_garbage(wh, keep_sf_dirs=[keep_dir], max_age_days=5)
    assert res["dropped"] == ["mh_sigs_deadbeef"]
    assert sorted(res["kept"]) == sorted([f"mh_sigs_{tag}", "sim60_cafebabe"])
    assert os.path.isdir(old_kept)
    assert not os.path.exists(old_stray)
    assert os.path.isdir(young_stray)
