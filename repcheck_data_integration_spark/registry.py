"""queries()/oracle_sql() registry — the driver-contract backbone.

Every operator module registers its demo query (a ``(spark, sf_dir) ->
DataFrame`` callable) plus, when DuckDB can express the same computation, an
ANSI-SQL oracle twin. The driver compares row-count + schema + order-
insensitive value hash at sf0.01, so:

- alias every computed column identically on both sides;
- make every result deterministic (full tie-breaks on windows/top-k,
  sort_array on collected sets);
- keep floating aggregation exact by summing in DECIMAL then casting to
  DOUBLE (parallel double summation is order-dependent, decimal is not).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name``; ``oracle`` is the DuckDB SQL twin
    (omit for rows-only ops: geometry refine, UDF kernels, streaming)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from .plans import tpch, tpch_more, tpch_rest, tpch_final  # noqa: F401
    from .operators import (  # noqa: F401
        filters,
        joins,
        aggregates,
        windows,
        setops,
        upsert,
        resolve,
        spatial,
        dedup,
        similarity,
        textstats,
        multimodal,
        llm,
        quality,
        temporal,
        graph,
        textops,
        skew,
    )
    from .functions import scalar_queries  # noqa: F401
    from .sources import file_sources, pyds  # noqa: F401
    from .streaming import batch_windows  # noqa: F401
