"""A8: git-diff incremental source against this repository's own history."""

from __future__ import annotations

import subprocess

from codegraphdb_spark.sources.repo import changed_files


def test_changed_files_between_commits():
    commits = subprocess.run(
        ["git", "-C", "/root/repo", "log", "--format=%H", "-n", "8"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    old, new = commits[-1], commits[0]
    changes = changed_files("/root/repo", old, new)
    assert all(p.endswith(".py") for p in changes)
    assert any(p.startswith("codegraphdb_spark/") for p in changes)


def test_changed_files_same_commit_empty():
    head = subprocess.run(
        ["git", "-C", "/root/repo", "rev-parse", "HEAD"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    assert changed_files("/root/repo", head, head) == []
