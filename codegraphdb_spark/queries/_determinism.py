"""Determinism helpers for oracle-differential checking.

Floating-point SUM over a shuffled dataset is order-dependent, so a raw
``sum(double)`` hashes differently between Spark and DuckDB even when both
are "correct". The engine's convention: aggregate price-like doubles through
exact DECIMAL arithmetic (order-independent), then cast the final scalar
back to DOUBLE. Both engines round the same 2-decimal-precision inputs to
the same decimal, sum exactly, and emit the same double — bit-identical,
at any scale factor and any partitioning.

This matters at 100 TB, not just for tests: decimal aggregation keeps
results stable across AQE re-plans, partition counts and retry reshuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,4)"


def dsum(col: Column | str, scale_type: str = DEC) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale_type)).cast("double")


def davg(col: Column | str, scale_type: str = DEC) -> Column:
    """Exact-sum-based average: identical double on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(scale_type)).cast("double") / F.count(c)).cast("double")


def isum(col: Column | str, scale: int = 1_000_000) -> Column:
    """Order-independent exact sum of an ARBITRARY double column.

    double→decimal casts are NOT cross-engine deterministic (Spark rounds
    the exact binary expansion, DuckDB scales in floating point), so for
    raw doubles we scale in the double domain — ``round(x * scale)`` is the
    same double on both engines — then sum exact integers and divide back.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(F.round(c * scale).cast("bigint")).cast("double") / scale).cast("double")


def sql_isum(expr: str, scale: int = 1_000_000) -> str:
    """DuckDB-side mirror of :func:`isum`."""
    return f"CAST(CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / {scale} AS DOUBLE)"


def sql_dsum(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(30,4))) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"
