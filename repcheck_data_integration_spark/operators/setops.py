"""Sorts / limits / set operators (SURVEY.md §2.6).

Citations refer to /root/reference. Top-k queries order with full tie-breaks
so LIMIT is deterministic; Spark executes ordered-limit as TakeOrdered (no
global sort materialization) which is the scalable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "sort_order",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY (declared native op — reference only has max/min-by,
    bills_federal.py:127-128). Ordered limit → TakeOrdered."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "lim_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    """,
)
def lim_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """take-first (federal_area.py:54-55 sf.record(0)) made deterministic
    with an explicit order."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(1)
    )


@register(
    "set_union",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federal + state pipeline branches writing the same table
    (bills_federal.py vs bills_state.py) → unionByName with missing
    columns null-filled."""
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey", "c_name")
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0
    EXCEPT ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native extension: multiset difference."""
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 0).select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment"
    )
    return a.exceptAll(b)


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native extension: set intersection."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "set_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native: distinct projection (hash aggregate underneath)."""
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "fn_unpivot",
    oracle="""
    SELECT c_custkey, metric, val FROM (
        SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey' AS metric,
               CAST(c_nationkey AS DOUBLE) AS val
        FROM customer)
    """,
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native extension: unpivot/melt (wide → long) — the inverse of
    agg_vote_counts' pivot; Spark's unpivot is a zero-shuffle Expand."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
