"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q3-shaped: scan → pushed
filters → broadcast + shuffle joins → exact hash aggregate → top-k) on
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle twin where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from repcheck_data_integration_spark import registry
from repcheck_data_integration_spark.plans.tpch import flagship

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, flagship
    operators first (the driver samples a prefix)."""
    registry.load_all_modules()
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys absent here get the weaker rows-only check."""
    registry.load_all_modules()
    return dict(registry.ORACLE)
