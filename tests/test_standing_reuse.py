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
from codegraphdb_spark.operators.bucketing import (
    corpus_fingerprint, reuse_bucketed,
)
spark = get_spark("standing-reuse-test", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = {sf_dir!r}
import hashlib
name = "inc_bands_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
fp = corpus_fingerprint(sf_dir, "documents")
pre = reuse_bucketed(spark, name, fp, ["band_key"], 8, ["band_key"])
from codegraphdb_spark.queries.text import _standing_band_table
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
    # orphan warehouse dir so repeated test runs don't accumulate
    import hashlib

    name = "inc_bands_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(
        os.path.join(REPO, "spark-warehouse", name), ignore_errors=True
    )
