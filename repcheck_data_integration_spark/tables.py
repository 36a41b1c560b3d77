"""Fixture-table loaders (driver test data, TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/pruning into it.

    ``events.ts`` is TIMESTAMP(NANOS) in the fixture parquet, which Spark's
    TimestampType (micros) rejects; read it as long nanos and truncate to
    micros with integer division (double division would lose precision at
    2^60). DuckDB oracles mirror this with ``CAST(ts AS TIMESTAMP)``.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ntz_to_ltz(df)
    return _ntz_to_ltz(spark.read.parquet(path))


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to TIMESTAMP_LTZ at the scan.

    A session WITHOUT ``inferTimestampNTZ=false`` (the driver's) reads the
    fixture's nano timestamps as TIMESTAMP_NTZ, on which ``cast(ts as
    double)`` / ``unix_timestamp`` either fail (CAST_WITHOUT_SUGGESTION) or
    silently change meaning — the round-3 win_session_features crash.
    Casting once here (session TZ is UTC on both the builder's and the
    driver's sessions, verified by r3's epoch-hash-matched window queries)
    makes every downstream operator session-agnostic.
    """
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql plans."""
    for t in TABLE_NAMES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
