"""Query registry — the single place where every operator the engine claims
is recorded as a named, runnable, oracle-checked query.

Each registered entry becomes a ``queries()`` item in ``__spark_entry__.py``;
entries with an ``oracle`` string also become ``oracle_sql()`` items and are
hash-checked against DuckDB by the driver. Entries without an oracle (custom
stateful / iterative / non-SQL ops) get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``,
    optionally with its DuckDB-equivalent ANSI SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        # last-wins on re-registration: a module reload (e.g. the driver
        # re-importing __spark_entry__) re-runs decorators; crashing on
        # duplicates would take the whole contract down
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        else:
            ORACLE.pop(name, None)
        return fn

    return deco


def load_all() -> None:
    """Import every catalog module so decorators run. Idempotent."""
    import codegraphdb_spark.queries.relational  # noqa: F401
    import codegraphdb_spark.queries.events  # noqa: F401
    import codegraphdb_spark.queries.text  # noqa: F401
    import codegraphdb_spark.queries.similarity  # noqa: F401
    import codegraphdb_spark.queries.graph  # noqa: F401
