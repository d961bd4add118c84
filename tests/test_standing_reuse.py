"""Cross-session standing-index reuse (r8): a fresh session must
RE-ATTACH a fingerprint-matching persisted band table instead of
rebuilding, and a changed input must flip the fingerprint and force a
rebuild. Sessions are real subprocesses (the session catalog is
in-memory, so reuse can only be proven across processes); the fixture is
a tmp COPY of sf0.001 so the input can be mutated."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from codegraphdb_spark.session import get_spark
from codegraphdb_spark.operators.bucketing import reuse_bucketed
spark = get_spark("standing-reuse-test", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = {sf_dir!r}
import hashlib
name = "inc_bands_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
from codegraphdb_spark.queries.text import (
    _bands_fingerprint, _standing_band_table,
)
fp = _bands_fingerprint(sf_dir)
pre = reuse_bucketed(spark, name, fp, ["band_key"], 8, ["band_key"])
t0 = time.time()
t = _standing_band_table(spark, sf_dir)
out = dict(
    attached_before_build=pre is not None,
    rows=t.count(),
    build_sec=round(time.time() - t0, 2),
)
print("RESULT " + json.dumps(out))
"""


def _run(sf_dir: str) -> dict:
    code = _DRIVER.format(repo=REPO, sf_dir=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,  # warehouse dir resolves relative to CWD
        timeout=600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(
        f"driver produced no RESULT: rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-1500:]}\nstderr tail: {proc.stderr[-1500:]}"
    )


def test_band_table_reattaches_and_invalidates(tmp_path):
    sf_dir = str(tmp_path / "fixture")
    os.makedirs(sf_dir)
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet",
        os.path.join(sf_dir, "documents.parquet"),
    )

    first = _run(sf_dir)
    assert not first["attached_before_build"], "nothing to attach yet"
    assert first["rows"] > 0

    # fresh process, same input: must ATTACH (reuse_bucketed non-None
    # before any build) and see the identical row count
    second = _run(sf_dir)
    assert second["attached_before_build"], "fingerprint match must attach"
    assert second["rows"] == first["rows"]

    # mutate the input (append a byte -> size+mtime change): fingerprint
    # flips, attach must refuse, and the rebuild must go through
    with open(os.path.join(sf_dir, "documents.parquet"), "ab") as fh:
        fh.write(b"\x00")
    # restore a VALID parquet by re-copying (the mutation only needed to
    # exist at fingerprint time; keep the file readable for the rebuild)
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet",
        os.path.join(sf_dir, "documents.parquet"),
    )
    third = _run(sf_dir)
    assert not third["attached_before_build"], (
        "changed input fingerprint must refuse the stale attach"
    )
    assert third["rows"] == first["rows"]

    # hygiene: tmp_path-keyed table names are unique per run — remove the
    # orphan warehouse dirs (the band-table build also persists the
    # mh_sigs_<tag> signature table it derives from) so repeated test
    # runs don't accumulate
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    for prefix in ("inc_bands_", "mh_sigs_"):
        shutil.rmtree(
            os.path.join(REPO, "spark-warehouse", prefix + tag),
            ignore_errors=True,
        )


def test_reuse_refusal_conditions(spark, tmp_path):
    """r9 (ADVICE r8): the attach path must refuse — and thereby force a
    rebuild — when the kernel params change (fingerprint salt), when the
    requested bucket spec differs from the recorded one, and when a
    legacy sidecar lacks a recorded spec entirely."""
    import json

    from codegraphdb_spark.operators.bucketing import (
        _table_location,
        corpus_fingerprint,
        index_params_token,
        record_fingerprint,
        reuse_bucketed,
        write_bucketed,
    )

    fixture = tmp_path / "in"
    fixture.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet",
        fixture / "documents.parquet",
    )
    sf_dir = str(fixture)

    fp_a = corpus_fingerprint(sf_dir, "documents", params="kernel/v1")
    fp_b = corpus_fingerprint(sf_dir, "documents", params="kernel/v2")
    assert fp_a != fp_b, "params salt must flip the fingerprint"

    table = "reuse_refusal_probe"
    df = spark.range(20).selectExpr("id AS doc_id", "id * 3 AS v")
    write_bucketed(df, table, ["doc_id"], 4, sort_cols=["doc_id"])
    record_fingerprint(spark, table, fp_a, ["doc_id"], 4)
    loc = _table_location(spark, table)
    try:
        # matching everything -> attach
        assert reuse_bucketed(spark, table, fp_a, ["doc_id"], 4) is not None
        # changed kernel params -> refuse (the silent-stale-attach bug)
        assert reuse_bucketed(spark, table, fp_b, ["doc_id"], 4) is None
        # bucket-count mismatch -> refuse (files hashed under one spec
        # must never be declared under another)
        assert reuse_bucketed(spark, table, fp_a, ["doc_id"], 8) is None
        # bucket-column mismatch -> refuse
        assert reuse_bucketed(spark, table, fp_a, ["v"], 4) is None
        # legacy sidecar (fp only, no spec recorded) -> refuse
        with open(os.path.join(loc, "_corpus_fp.json"), "w") as fh:
            json.dump({"fp": fp_a}, fh)
        assert reuse_bucketed(spark, table, fp_a, ["doc_id"], 4) is None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(loc, ignore_errors=True)


def test_index_params_token_tracks_source():
    from codegraphdb_spark.operators.bucketing import index_params_token

    def k1(x):
        return x + 1

    def k2(x):
        return x + 2

    assert index_params_token("v1", k1, 16) == index_params_token("v1", k1, 16)
    assert index_params_token("v1", k1, 16) != index_params_token("v1", k2, 16)
    assert index_params_token("v1", k1, 16) != index_params_token("v1", k1, 32)
