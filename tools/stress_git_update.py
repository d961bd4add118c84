"""Exercise the CLI update across two REAL git commits (VERDICT r5 item 7).

The A8 source (sources/repo.changed_files) derives the change list from
``git diff --name-only`` — until now only unit-tested against synthetic
change lists. This tool builds an actual git repository (git init / add /
commit), evolves it over two commits (modify + add + delete), drives the
REAL CLI (`build` at commit1, `update` at commit2 with --changed straight
from git diff), and asserts the v1→v2 snapshot invariants:

  1. B7 never auto-stamps changed-file nodes: a symbol DELETED by commit2
     keeps versions == [v1] (it must not ride into v2);
  2. unchanged-file nodes carry BOTH versions;
  3. the v2 membership of the updated snapshot equals a from-scratch
     build of the commit2 tree (the hard equivalence — update ≡ rebuild).

Reference anchor: update_version.py:77-100 (re-index changed files,
label-stamp the rest). Usage: python tools/stress_git_update.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from codegraphdb_spark.__main__ import main as cli_main  # noqa: E402
from codegraphdb_spark.engine import GraphEngine  # noqa: E402
from codegraphdb_spark.session import get_spark  # noqa: E402
from codegraphdb_spark.sources.repo import changed_files, scan_repo  # noqa: E402

V1_FILES = {
    "pkg/__init__.py": "",
    "pkg/base.py": (
        "LIMIT = 10\n\n"
        "class Base:\n"
        "    def ping(self):\n        return LIMIT\n"
        "    def retired(self):\n        return 0\n"
    ),
    "pkg/user.py": (
        "from pkg.base import Base\n\n"
        "class User(Base):\n"
        "    def run(self):\n        return self.ping()\n"
    ),
    "pkg/stable.py": "def untouched():\n    return 42\n",
    "pkg/doomed.py": "def goner():\n    return -1\n",
}

V2_CHANGES = {
    # modified: drops retired(), changes LIMIT
    "pkg/base.py": (
        "LIMIT = 20\n\n"
        "class Base:\n"
        "    def ping(self):\n        return LIMIT\n"
    ),
    # added
    "pkg/fresh.py": "def newcomer():\n    return 7\n",
    # pkg/doomed.py deleted
}


def _git(repo: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", repo, *args], capture_output=True, text=True, check=True
    ).stdout.strip()


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="gitup_")
    repo = os.path.join(tmp, "wt")
    snap = os.path.join(tmp, "snap")
    os.makedirs(repo)
    try:
        _git(tmp, "init", "-q", "wt")
        _git(repo, "config", "user.email", "t@example.com")
        _git(repo, "config", "user.name", "t")
        for p, c in V1_FILES.items():
            os.makedirs(os.path.join(repo, os.path.dirname(p)), exist_ok=True)
            with open(os.path.join(repo, p), "w") as f:
                f.write(c)
        _git(repo, "add", "-A")
        _git(repo, "commit", "-qm", "v1")
        c1 = _git(repo, "rev-parse", "HEAD")
        for p, c in V2_CHANGES.items():
            with open(os.path.join(repo, p), "w") as f:
                f.write(c)
        os.remove(os.path.join(repo, "pkg/doomed.py"))
        _git(repo, "add", "-A")
        _git(repo, "commit", "-qm", "v2")
        c2 = _git(repo, "rev-parse", "HEAD")

        # the A8 source: change list straight from real git history
        changes = changed_files(repo, c1, c2)
        assert sorted(changes) == ["pkg/base.py", "pkg/doomed.py", "pkg/fresh.py"], changes
        print(f"git diff {c1[:8]}..{c2[:8]} -> {changes}")

        # CLI build at commit1 (checkout the v1 tree), update at commit2
        _git(repo, "checkout", "-q", c1)
        rc = cli_main(["build", repo, snap, "--version", "v1"])
        assert rc == 0
        _git(repo, "checkout", "-q", c2)
        rc = cli_main(
            ["update", repo, snap, "--old", "v1", "--new", "v2"]
            + [x for c in changes for x in ("--changed", c)]
        )
        assert rc == 0

        spark = get_spark("codegraphdb-cli")
        eng = GraphEngine(spark)
        nodes, edges = eng.read_snapshot(snap)
        nodes.cache()

        from pyspark.sql import functions as F

        # (1) deleted symbols of CHANGED files stay v1-only (B7 must not
        # stamp changed-file nodes)
        for gone in ("pkg.base.Base.retired", "pkg.doomed.goner", "pkg.doomed"):
            row = nodes.filter(F.col("full_name") == gone).collect()
            assert len(row) == 1, f"{gone}: {row}"
            assert row[0]["versions"] == ["v1"], (gone, row[0]["versions"])
        # (2) unchanged files carry both versions
        for kept in ("pkg.stable.untouched", "pkg.user.User"):
            row = nodes.filter(F.col("full_name") == kept).collect()
            assert sorted(row[0]["versions"]) == ["v1", "v2"], (kept, row[0])
        # new symbols are v2-only
        for new in ("pkg.fresh.newcomer",):
            row = nodes.filter(F.col("full_name") == new).collect()
            assert row[0]["versions"] == ["v2"], (new, row[0])
        print("invariants 1+2 OK (deleted v1-only, unchanged both, added v2-only)")

        # (3) v2 membership == from-scratch build of the commit2 tree
        fresh_n, fresh_e, _ = eng.build(scan_repo(spark, repo), "v2")
        sel_n = ["full_name", "kind", "name", "file_path"]
        sel_e = ["src", "dst", "rel_type"]
        up_n = nodes.filter(F.array_contains("versions", "v2")).select(*sel_n)
        up_e = edges.filter(F.array_contains("versions", "v2")).select(*sel_e)
        for label, a, b in (
            ("nodes", up_n, fresh_n.select(*sel_n)),
            ("nodes rev", fresh_n.select(*sel_n), up_n),
            ("edges", up_e, fresh_e.select(*sel_e)),
            ("edges rev", fresh_e.select(*sel_e), up_e),
        ):
            diff = a.exceptAll(b)
            assert diff.isEmpty(), f"{label}: {diff.limit(5).collect()}"
        print("invariant 3 OK (update v2-membership == from-scratch rebuild)")
        print("OK — real-git-history CLI update holds all snapshot invariants")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
