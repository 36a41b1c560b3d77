"""Join operators (SURVEY.md §2.3). Citations refer to /root/reference.

Strategy notes for 100 TB: dimension tables (region/nation/fips-style
lookups) are broadcast — no shuffle; fact⋈fact joins shuffle on the join key
(bucket the stored tables on those keys to eliminate it); semi/anti joins
carry only the key columns of the probe side. AQE re-plans skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "join_bcast_lookup",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_bcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIPS-style dict lookup → broadcast hash join
    (federal_house_districts.py:64,70-82)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "join_fk_inner",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def join_fk_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK point-lookup join (zip_code_overlap.py:26-31), set-oriented:
    one distributed join instead of O(N) driver round trips."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )


@register(
    "join_fk_missing_check",
    oracle="""
    SELECT count(*) AS n_missing
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
)
def join_fk_missing_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference hard-fails on missing FK (zip_code_overlap.py:30-31);
    set-oriented version: anti-join count assert."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_missing"))
    )


@register(
    "join_semi_bill_vote",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def join_semi_bill_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Votes kept only if their bill was ingested → left semi equi-join
    (bills_federal.py:115,161,186-188)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return o.join(c, o.o_custkey == c.c_custkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "join_anti_bill_vote",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders WHERE o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def join_anti_bill_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complementary warning branch: votes with NO matching bill
    (bills_federal.py:213-214) → left anti join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return o.join(c, o.o_custkey == c.c_custkey, "left_anti").select(
        "o_orderkey", "o_custkey"
    )


@register(
    "join_composite_key",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = substr(o.o_orderstatus, 1, 1)
    """,
)
def join_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key equi-join ((session, identifier) in
    bills_federal.py:186-188)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_returnflag == F.substring(o.o_orderstatus, 1, 1)),
    ).select("l_orderkey", "l_linenumber", "o_orderpriority")


@register(
    "join_map_fallback",
    oracle="""
    SELECT n.n_nationkey,
           coalesce(m1.r_name, m2.r_name, 'UNMAPPED') AS mapped_name
    FROM nation n
    LEFT JOIN (SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2) m1
      ON n.n_regionkey = m1.r_regionkey
    LEFT JOIN (SELECT r_regionkey, r_name FROM region) m2
      ON n.n_regionkey = m2.r_regionkey
    """,
)
def join_map_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mapping-dict fallback chain (people_state.py:61-73: chamber map →
    'special' map → default) = chained left joins + coalesce."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    m1 = r.filter(F.col("r_regionkey") < 2).select(
        F.col("r_regionkey").alias("m1_key"), F.col("r_name").alias("m1_name")
    )
    m2 = r.select(F.col("r_regionkey").alias("m2_key"), F.col("r_name").alias("m2_name"))
    return (
        n.join(F.broadcast(m1), n.n_regionkey == m1.m1_key, "left")
        .join(F.broadcast(m2), n.n_regionkey == m2.m2_key, "left")
        .select(
            "n_nationkey",
            F.coalesce("m1_name", "m2_name", F.lit("UNMAPPED")).alias("mapped_name"),
        )
    )
