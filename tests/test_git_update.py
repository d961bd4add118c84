"""CLI update across two REAL git commits (VERDICT r5 item 7): the full
scenario — git init/commit, build at commit1, `git diff --name-only`-driven
update at commit2, deletion/addition/modification invariants, and
update ≡ from-scratch-rebuild equivalence — lives in
tools/stress_git_update.py with hard asserts; this test drives it."""

from __future__ import annotations


def test_real_git_history_cli_update(spark):
    from tools.stress_git_update import main

    assert main() == 0
