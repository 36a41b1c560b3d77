"""Projection / filter operators (SURVEY.md §2.2).

Reference behaviours re-expressed declaratively so Catalyst pushes the
predicate + column pruning into the parquet scan (check `.explain`:
PushedFilters / ReadSchema). Citations refer to /root/reference.

At 100 TB these are the cheapest ops in the engine *if* they stay
pushed-down — every query here is a single scan stage, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "prj_select",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def prj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned select (reference: scripts/bills/bills_federal.py:163-177
    'Keeping just the name info to reduce memory pressure')."""
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@register(
    "flt_eq",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def flt_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate pushed to the scan (bills_federal.py:174-176)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "flt_conj",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_discount > 0.05 AND l_quantity < 25
    """,
)
def flt_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate (zip_code_overlap.py:33-38)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_discount") > 0.05)
        & (F.col("l_quantity") < 25)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


@register(
    "flt_isin",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_nationkey NOT IN (3, 7)
    """,
)
def flt_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership / anti-membership filters (census_utils.py:9,
    people_federal.py:33 territory skip lists)."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & ~F.col("c_nationkey").isin(3, 7)
    ).select("c_custkey", "c_mktsegment")


@register(
    "flt_sentinel",
    oracle="""
    SELECT p_partkey, p_brand FROM part
    WHERE p_brand <> 'Brand#11' AND p_size <> 0
    """,
)
def flt_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip sentinel codes ('ZZ'/'ZZZ' districts —
    federal_house_districts.py:72-78)."""
    p = load(spark, sf_dir, "part")
    return p.filter((F.col("p_brand") != "Brand#11") & (F.col("p_size") != 0)).select(
        "p_partkey", "p_brand"
    )


@register(
    "flt_semi_lookup",
    oracle="""
    SELECT l_orderkey, l_partkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
    """,
)
def flt_semi_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absent-key skip = semi join with the lookup table
    (federal_house_districts.py:72-78 'FIPS code not in lookup → skip')."""
    li = load(spark, sf_dir, "lineitem")
    lookup = load(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return li.join(
        F.broadcast(lookup), li.l_partkey == lookup.p_partkey, "left_semi"
    ).select("l_orderkey", "l_partkey")


@register(
    "flt_notnull",
    oracle="""
    SELECT event_id,
           CASE WHEN value > 100 THEN value END AS big_value
    FROM events
    WHERE nullif(event_type, 'click') IS NOT NULL
    """,
)
def flt_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-guard branches (bills_federal.py:43-46 'if not date_str')."""
    e = load(spark, sf_dir, "events")
    return (
        e.filter(F.nullif(F.col("event_type"), F.lit("click")).isNotNull())
        .select(
            "event_id",
            F.when(F.col("value") > 100, F.col("value")).alias("big_value"),
        )
    )


@register(
    "flt_lambda",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events WHERE event_type = 'click' AND user_id % 2 = 0
    """,
)
def flt_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's in-memory candidate-blocking filter
    (vote_matching.py:196-209: filter(lambda p: p['state']==s) then chamber)
    — declaratively it's just a conjunctive predicate Catalyst can push,
    where the lambda version forces a full driver-side materialization."""
    e = load(spark, sf_dir, "events")
    return e.filter(
        (F.col("event_type") == "click") & (F.col("user_id") % 2 == 0)
    ).select("event_id", "user_id", "event_type")
