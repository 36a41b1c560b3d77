"""Data-quality / profiling operators.

The reference's quality surface is ad-hoc fail-fast checks and a
duplicate-ID scan (/root/reference/scripts/state_house_districts.py:132-135,
bills_federal.py:104-125). An engine used for 100 TB ingest needs those as
first-class, set-oriented operators: one pass computes every column's
profile; constraint violations come back as a relation (empty = pass), not
an exception buried in a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "dq_profile",
    oracle="""
    SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
           count(o_orderkey) AS n_nonnull,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    """,
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (rows / non-null / distinct / min / max) for a set of
    columns in ONE scan — the grouping-free multi-aggregate Spark compiles
    to a single pass with partial aggregation."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_custkey"]
    profiled = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            agg
            for c in cols
            for agg in (
                F.count(F.col(c)).alias(f"{c}__nonnull"),
                F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            )
        ],
    )
    # unpivot the single wide row into one profile row per column — stays on
    # the executors (stack = zero-shuffle Expand), no driver collect
    stack_args = ", ".join(
        f"'{c}', `{c}__nonnull`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return profiled.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS"
        " (column_name, n_nonnull, n_distinct, min_value, max_value)",
        "n_rows",
    ).select(
        "column_name", "n_rows", "n_nonnull", "n_distinct", "min_value", "max_value"
    )


@register(
    "dq_constraint_check",
    oracle="""
    SELECT 'pk_unique' AS constraint_name, count(*) AS n_violations
    FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'status_domain', count(*)
    FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P')
    UNION ALL
    SELECT 'price_positive', count(*)
    FROM orders WHERE o_totalprice <= 0
    UNION ALL
    SELECT 'fk_customer', count(*)
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
)
def dq_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite returning a violations relation (all
    zeros on healthy data): PK uniqueness (the reference's duplicate-ID
    Counter), a value domain, a range check, and FK integrity (the
    reference's hard-fail missing-area lookup) — each one aggregate/
    anti-join, no driver loops."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    pk = (
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("pk_unique").alias("constraint_name"), "n_violations")
    )
    domain = o.filter(~F.col("o_orderstatus").isin("O", "F", "P")).agg(
        F.count(F.lit(1)).alias("n_violations")
    ).select(F.lit("status_domain").alias("constraint_name"), "n_violations")
    rng = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count(F.lit(1)).alias("n_violations")
    ).select(F.lit("price_positive").alias("constraint_name"), "n_violations")
    fk = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("fk_customer").alias("constraint_name"), "n_violations")
    )
    return pk.unionByName(domain).unionByName(rng).unionByName(fk)


@register(
    "sample_deterministic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 < 10
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample by hashing the key (md5 bucket), not rand():
    the same rows are selected on every engine, every run, at every
    parallelism — the only kind of sample that composes across a 100 TB
    pipeline (joins between sampled tables stay consistent). Spark's
    sample() and DuckDB's USING SAMPLE are both engine-local RNGs and can
    never agree."""
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return o.filter(bucket < 10).select("o_orderkey", "o_custkey", "o_totalprice")
