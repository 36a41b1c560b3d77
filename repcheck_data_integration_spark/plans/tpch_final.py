"""Final TPC-H tranche — q8/q11/q15/q20/q21 analogues. With these, all 22
classic decision-support plan shapes are represented (see COVERAGE.md for
the full q1-q22 map). Fixture adaptations: no partsupp → the shipped
part-supplier link or retailprice proxies stand in; no comment/phone text →
key-derived predicates.

Shapes added here:
- q8: conditional market-share ratio (numerator = CASE inside the same
  aggregate as the denominator);
- q11: HAVING against a broadcast scalar (group value > fraction of total);
- q15: argmax over an aggregated relation (max revenue supplier, tie-safe);
- q20: two-level semi-join chain (suppliers shipping enough of the
  target parts);
- q21: EXISTS and NOT-EXISTS on the same fact with different predicates
  (the only-late-supplier-in-a-multi-supplier-order query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import exact_sum, sql_exact_sum, scaled_long
from ..registry import register
from ..tables import load


@register(
    "tpch_q8_market_share",
    oracle=f"""
    WITH flat AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS vol,
               n.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA')
    SELECT o_year,
           floor({sql_exact_sum(
               "CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE 0.0 END")}
               / {sql_exact_sum('vol')} * 10000.0 + 0.5) / 10000.0
               AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_1's share of ASIA order volume per year — the
    numerator is a CASE branch of the SAME exact-sum aggregate as the
    denominator (one pass, no self-join), ratio stable-rounded."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("vol"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    num = exact_sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("vol")).otherwise(0.0)
    )
    den = exact_sum(F.col("vol"))
    return flat.groupBy("o_year").agg(
        (F.floor(num / den * 10000.0 + 0.5) / 10000.0).alias("mkt_share")
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH pv AS (
        SELECT l.l_partkey,
               CAST(sum(CAST(round((l.l_quantity * p.p_retailprice) * 100, 0)
                             AS BIGINT)) AS BIGINT) AS pv_c
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY l.l_partkey),
    total AS (SELECT CAST(sum(pv_c) AS BIGINT) AS tv_c FROM pv)
    SELECT pv.l_partkey, CAST(pv_c / 100.0 AS DOUBLE) AS part_value
    FROM pv, total
    WHERE CAST(pv_c AS DOUBLE) > CAST(tv_c AS DOUBLE) * 0.0005
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part shipped value, keeping parts above a FRACTION of
    the grand total — the scalar total re-aggregates the grouped relation
    (tiny) and broadcasts back as a 1-row frame; no second scan of the
    fact. Both the per-part value AND the grand total stay in scaled
    integer cents until the very end (a float re-sum of part_value would be
    order/partition-dependent and could flip the borderline threshold
    compare across engines); the fraction compare is int-exact cast to
    double once, identically on both sides."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    pv = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                scaled_long(
                    F.col("l_quantity") * F.col("p_retailprice"), 100
                )
            ).alias("pv_c")
        )
    )
    total = pv.agg(F.sum("pv_c").alias("tv_c"))
    return (
        pv.join(F.broadcast(total))
        .filter(
            F.col("pv_c").cast("double") > F.col("tv_c").cast("double") * 0.0005
        )
        .select(
            "l_partkey",
            (F.col("pv_c") / 100.0).cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               {sql_exact_sum('l_extendedprice * (1 - l_discount)')}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) with maximum quarterly revenue — argmax
    over an AGGREGATED relation. The engine form reuses the grouped frame
    for both the max (re-aggregated, broadcast) and the probe side; exact
    revenue makes the equality compare safe, and genuine ties all surface
    (same as the SQL)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q20_part_availability",
    oracle="""
    WITH red_parts AS (
        SELECT p_partkey FROM part WHERE contains(p_name, 'red')),
    heavy AS (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM red_parts)
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100.0)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    """,
)
def q20_part_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: two-level semi-join chain — parts filtered by name feed a
    quantity-threshold aggregation over lineitem, whose survivors semi-join
    suppliers. Every IN becomes a left-semi hash join; nothing widens."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = load(spark, sf_dir, "supplier")
    heavy = (
        li.filter(F.col("l_shipdate") >= "1997-01-01")
        .join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100.0)
        .select("l_suppkey")
    )
    return s.join(
        heavy, s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


LATE_DAYS = 60


@register(
    "tpch_q21_waiting_supplier",
    oracle=f"""
    WITH ol AS (
        SELECT l.l_orderkey, l.l_suppkey,
               max(CASE WHEN l.l_shipdate >
                        o.o_orderdate + {LATE_DAYS} * INTERVAL 1 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY l.l_orderkey, l.l_suppkey)
    SELECT s.s_name, count(*) AS numwait
    FROM ol late
    JOIN supplier s ON s.s_suppkey = late.l_suppkey
    WHERE late.is_late = 1
      AND EXISTS (SELECT 1 FROM ol o2
                  WHERE o2.l_orderkey = late.l_orderkey
                    AND o2.l_suppkey <> late.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM ol o3
                      WHERE o3.l_orderkey = late.l_orderkey
                        AND o3.l_suppkey <> late.l_suppkey
                        AND o3.is_late = 1)
    GROUP BY s.s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late shipper on multi-supplier
    orders. The per-(order, supplier) lateness flag is aggregated once,
    then the EXISTS becomes a left-semi join and the NOT EXISTS a
    left-anti join against two filtered views of that SAME relation —
    three passes over a small aggregate instead of correlated subqueries
    per row. Late = shipped more than {LATE_DAYS} days after order date
    (receipt/commit columns don't exist in the fixture)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    ol = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate")
                    + F.expr(f"make_dt_interval({LATE_DAYS})"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    late = ol.filter(F.col("is_late") == 1).select("l_orderkey", "l_suppkey")
    others = ol.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    late_others = ol.filter(F.col("is_late") == 1).select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    waiting = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o_ok"))
            & (F.col("l_suppkey") != F.col("o_sk")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o_ok"))
            & (F.col("l_suppkey") != F.col("o_sk")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
