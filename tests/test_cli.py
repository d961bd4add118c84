"""CLI lifecycle test: build → update → query through the __main__ entry
(the reference's run_mutiprocess / update_version / graphDB __main__
workflows, one command each)."""

from __future__ import annotations

import subprocess
import sys


def _run(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "codegraphdb_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=280,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cli_build_update_query(tmp_path):
    snap = str(tmp_path / "snap")
    out = _run("build", "/root/repo/codegraphdb_spark", snap)
    assert "nodes" in out and "edges" in out

    out = _run(
        "update", "/root/repo/codegraphdb_spark", snap,
        "--old", "v1", "--new", "v2", "--changed", "engine.py",
    )
    assert "updated v1 -> v2" in out

    out = _run(
        "query", snap,
        "SELECT concat_ws(',', sort_array(versions)) AS v FROM nodes "
        "WHERE full_name = 'engine.GraphEngine'",
    )
    assert "'v': 'v1,v2'" in out

    out = _run("query", snap, "MATCH (c:CLASS {name: 'GraphEngine'}) RETURN c")
    assert "engine.GraphEngine" in out
