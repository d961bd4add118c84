"""The committed graph-oracle input CSVs (tests/fixtures/graph_oracle/)
must always equal a fresh dump from the live pipeline — otherwise the
recomputing g_* oracles would silently verify against stale inputs."""

from __future__ import annotations

import io
import os

from tools.dump_graph_oracle import FIXTURE_DIR, dump_tables


def test_committed_oracle_inputs_match_fresh_dump(spark):
    fresh = dump_tables(spark)
    assert sorted(os.listdir(FIXTURE_DIR)) == sorted(fresh)
    for name, pdf in fresh.items():
        buf = io.StringIO()
        pdf.to_csv(buf, index=False, lineterminator="\n")
        with open(os.path.join(FIXTURE_DIR, name), encoding="utf-8") as fh:
            committed = fh.read()
        assert committed == buf.getvalue(), f"{name} is stale — rerun tools/dump_graph_oracle.py"
