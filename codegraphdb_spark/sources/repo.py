"""Repository sources (reference §2.A A1/A2/A5/A8).

- ``scan_repo``: recursive *.py discovery + content read as ONE distributed
  scan (reference walks the tree on the driver, run_mutiprocess.py:19-25,
  then spawns a subprocess per file; here `spark.read.text(wholetext)` with
  recursive lookup turns the repo into a files DataFrame and extraction
  parallelism is just partitioning).
- ``files_from_pairs``: in-memory snippet-as-module source (A5,
  indexer.py:73-98) — a code string becomes a one-row files DataFrame.
- ``changed_files``: git-diff incremental source (A8,
  update_version.py:47-56) — driver-side git, result as a plain list for
  partition-pruned re-extraction.
"""

from __future__ import annotations

import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codegraphdb_spark.datamodel import FILES_SCHEMA


def relative_path_col(root: str):
    """Column: decoded repo-relative path from input_file_name().

    input_file_name() yields a URL-ENCODED file:///abs/path URI — decode
    before stripping the prefix, or paths with spaces/percent-escapes keep
    the encoded form and never match git-diff change lists or the
    repo-relative paths hydrate_code joins on. url_decode is form-encoding
    ('+' → space), but the URI form leaves literal '+' unencoded — protect
    it first so 'a+b.py' survives (ADVICE r2). THE one definition of this
    invariant — scan_repo and the streaming indexer's load_files must
    decode identically or change-list pruning silently misses files."""
    import re

    prefix = (root if root.endswith("/") else root + "/")
    decoded = F.url_decode(F.regexp_replace(F.input_file_name(), r"\+", "%2B"))
    # URI scheme forms vary by source (file:///abs from input_file_name,
    # file:/abs from the binaryFile source) — normalize to a plain path
    # before stripping the root prefix
    plain = F.regexp_replace(decoded, "^file:/+", "/")
    return F.regexp_replace(plain, "^" + re.escape(prefix), "")


def uri_to_relative(uri: str, root: str) -> str:
    """Driver-side twin of relative_path_col for a single URI string
    (urllib.parse.unquote leaves literal '+' intact, so no protection
    step is needed here — asserted equivalent in tests)."""
    import re
    from urllib.parse import unquote

    path = re.sub(r"^file:/+", "/", unquote(uri))
    prefix = (root if root.endswith("/") else root + "/")
    return path[len(prefix):] if path.startswith(prefix) else path


def scan_repo(spark: SparkSession, root: str) -> DataFrame:
    """All *.py files under ``root`` as (path repo-relative, content)."""
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.py")
        .text(root, wholetext=True)
    )
    return df.select(
        relative_path_col(root).alias("path"),
        F.col("value").alias("content"),
    )


def files_from_pairs(spark: SparkSession, pairs: list[tuple[str, str]]) -> DataFrame:
    """[(repo-relative path, source code)] → files DataFrame (A5).

    Routed through a pandas DataFrame ON PURPOSE: createDataFrame over a
    plain Python list plans as ``Scan ExistingRDD`` — a pickled-Python-RDD
    scan that re-pays several seconds of Python-worker round-trip on EVERY
    downstream action — while the Arrow/pandas path plans as a JVM-side
    ``LocalTableScan`` that replays for free. Partition count matches the
    data so downstream mapInPandas stages don't schedule dozens of
    near-empty Python-worker tasks."""
    import pandas as pd

    n = max(1, min(len(pairs) // 8, 64))
    pdf = pd.DataFrame(pairs or None, columns=["path", "content"])
    return spark.createDataFrame(pdf, schema=FILES_SCHEMA).coalesce(n)


def changed_files(repo: str, commit1: str, commit2: str) -> list[str]:
    """git diff --name-only between two commits (A8)."""
    out = subprocess.run(
        ["git", "-C", repo, "diff", "--name-only", commit1, commit2],
        capture_output=True,
        text=True,
        check=True,
    )
    return [line for line in out.stdout.splitlines() if line.endswith(".py")]
