"""A8: git-diff incremental source (`changed_files`) against a synthetic
two-commit git fixture.

r7 verdict item 1: the previous version of this test asserted against
/root/repo's OWN last-8-commit history, which made it self-referential —
a docs-only closing commit rotated the window and broke it even though the
engine function was correct. Reference anchor: update_version.py:47-56
(`get_change_list` is pure git-diff; its test is now pure git-diff too).
"""

from __future__ import annotations

import subprocess

from codegraphdb_spark.sources.repo import changed_files


def _git(repo, *args):
    subprocess.run(
        ["git", "-C", str(repo), *args],
        capture_output=True,
        text=True,
        check=True,
        env={
            "GIT_AUTHOR_NAME": "t",
            "GIT_AUTHOR_EMAIL": "t@t",
            "GIT_COMMITTER_NAME": "t",
            "GIT_COMMITTER_EMAIL": "t@t",
            "HOME": str(repo),
            "PATH": "/usr/bin:/bin:/usr/local/bin",
        },
    )


def _rev(repo):
    return subprocess.run(
        ["git", "-C", str(repo), "rev-parse", "HEAD"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()


def _fixture_repo(tmp_path):
    repo = tmp_path / "fixrepo"
    repo.mkdir()
    _git(repo, "init", "-q")
    (repo / "pkg").mkdir()
    (repo / "pkg" / "a.py").write_text("A = 1\n")
    (repo / "pkg" / "b.py").write_text("B = 1\n")
    (repo / "README.md").write_text("docs\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "c1")
    old = _rev(repo)
    (repo / "pkg" / "a.py").write_text("A = 2\n")      # modified
    (repo / "pkg" / "c.py").write_text("C = 1\n")      # added
    (repo / "README.md").write_text("docs v2\n")       # non-.py change
    (repo / "pkg" / "b.py").unlink()                   # deleted
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "c2")
    new = _rev(repo)
    return repo, old, new


def test_changed_files_between_commits(tmp_path):
    repo, old, new = _fixture_repo(tmp_path)
    changes = changed_files(str(repo), old, new)
    # .py-only filter: README.md change must not appear
    assert all(p.endswith(".py") for p in changes)
    # modified, added, AND deleted .py files all appear exactly once
    assert sorted(changes) == ["pkg/a.py", "pkg/b.py", "pkg/c.py"]


def test_changed_files_same_commit_empty(tmp_path):
    repo, _, new = _fixture_repo(tmp_path)
    assert changed_files(str(repo), new, new) == []
