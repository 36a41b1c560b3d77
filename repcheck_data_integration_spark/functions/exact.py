"""Deterministic (order-independent) floating aggregation helpers.

Parallel summation of doubles is order-dependent — at 1000 executors a plain
``sum(double)`` returns a different ULP every run and can never hash-match a
single-threaded oracle. The fixture money columns carry 2 decimals, so we sum
the scaled integer instead: ``sum(cast(round(x * 100) as bigint))`` is exact,
associative, and identical in Spark and DuckDB; divide once at the end.

The oracle twins in the query registry use the literally-identical SQL
formula so per-row IEEE arithmetic matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent sum of a fixed-point double column, as double."""
    s = 10**scale
    return (F.sum(F.round(col * F.lit(s), 0).cast("long")) / F.lit(float(s))).cast(
        "double"
    )


def exact_avg(col: Column, scale: int = 2) -> Column:
    """Order-independent avg of a fixed-point double column, as double."""
    s = 10**scale
    return (
        F.sum(F.round(col * F.lit(s), 0).cast("long"))
        / (F.count(col) * F.lit(float(s)))
    ).cast("double")


def sql_exact_sum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`exact_sum` — same parenthesization on purpose."""
    s = 10**scale
    return f"CAST(sum(CAST(round(({expr}) * {s}, 0) AS BIGINT)) / {float(s)} AS DOUBLE)"


def sql_exact_avg(expr: str, scale: int = 2) -> str:
    s = 10**scale
    return (
        f"CAST(sum(CAST(round(({expr}) * {s}, 0) AS BIGINT))"
        f" / (count({expr}) * {float(s)}) AS DOUBLE)"
    )
