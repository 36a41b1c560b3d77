"""Spark-native JDBC sink leg (snk_jdbc, layer 3).

The reference's sink is a Postgres upsert over psycopg2 (reference
scripts/database/database.py:30-39 connection, :52-73 ON CONFLICT
statement). ``jdbc_sink.py`` re-expresses the row-protocol half
(SQL-gen + foreachPartition DB-API writer); THIS module is the
Spark-`df.write.jdbc` half, exercised for real against the embedded Apache
Derby engine that ships inside the PySpark distribution (derby-*.jar on the
driver classpath) — no external server needed, and the same code path a
cluster uses against Postgres/MySQL (swap the URL + driver).

Upsert shape: Spark JDBC has no native upsert, so the scalable pattern is
*staged merge* —

1. ``df.write.jdbc`` the delta into a staging table (distributed: one JDBC
   connection per partition, batched inserts, no driver collect);
2. ONE server-side ``MERGE INTO target USING staging`` statement executed
   from the driver (set-based; the server does the keyed matching);
3. drop the staging table.

At 100 TB the heavy lifting — shipping rows — is step 1 and scales with
executors; step 2 is a single SQL statement whose cost lives in the target
database, exactly where a keyed upsert must run. ``created_at`` is excluded
from the MATCHED update set, mirroring database.py:68.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    """Embedded-Derby JDBC URL for a filesystem database directory."""
    return f"jdbc:derby:{db_path}" + (";create=true" if create else "")


def _driver_connection(spark: SparkSession, url: str):
    """Open a driver-side java.sql.Connection through the live JVM (used
    only for DDL + the single MERGE statement — never for row traffic)."""
    jvm = spark._jvm
    # keep derby.log out of the repo/cwd
    jvm.java.lang.System.setProperty("derby.stream.error.field",
                                     "java.lang.System.err")
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    return jvm.java.sql.DriverManager.getConnection(url)


def _execute(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(sql)
    finally:
        st.close()


def _table_exists(conn, table: str) -> bool:
    rs = conn.getMetaData().getTables(None, None, table.upper(), None)
    try:
        return rs.next()
    finally:
        rs.close()


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str = DERBY_DRIVER,
    num_partitions: int | None = None,
    column_types: str | None = None,
) -> None:
    """The distributed leg: every partition opens its own JDBC connection
    and pushes batched INSERTs. ``num_partitions`` caps connection
    fan-in to the target database (the knob that matters at cluster
    scale — 1000 executors must not open 1000 connections against one
    Postgres); ``column_types`` overrides Spark's default type mapping
    (e.g. VARCHAR(n) where the dialect would pick CLOB/TEXT, which
    Derby can't compare in MERGE keys)."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    w = df.write.format("jdbc").option("url", url).option(
        "dbtable", table
    ).option("driver", driver)
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.mode(mode).save()


def jdbc_read(
    spark: SparkSession, url: str, table: str, driver: str = DERBY_DRIVER
) -> DataFrame:
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .load()
    )


def merge_sql(
    target: str,
    staging: str,
    cols: Sequence[str],
    keys: Sequence[str],
    preserve: Sequence[str] = ("created_at",),
) -> str:
    """ANSI MERGE equivalent of the reference's ON CONFLICT upsert
    (database.py:52-73): update every non-key column except the preserved
    ones; insert everything when unmatched. Derby (10.11+), Postgres 15+,
    SQL Server and Oracle all accept this grammar."""
    missing = [k for k in keys if k not in cols]
    if missing:
        raise ValueError(f"key columns absent from cols: {missing}")

    # Spark's JDBC writer emits QUOTED column identifiers (case preserved),
    # so unquoted references here would fold to uppercase and miss them
    # (Derby 42X04). Quote every column; table names stay as given.
    def q(c: str) -> str:
        return '"' + c.replace('"', '""') + '"'

    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
    sets = ", ".join(
        f"{q(c)} = s.{q(c)}"
        for c in cols
        if c not in keys and c not in preserve
    )
    collist = ", ".join(q(c) for c in cols)
    vals = ", ".join(f"s.{q(c)}" for c in cols)
    matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else ""
    return (
        f"MERGE INTO {target} t USING {staging} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({vals})"
    )


def jdbc_upsert_staged(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    target: str,
    keys: Sequence[str],
    preserve: Sequence[str] = ("created_at",),
    driver: str = DERBY_DRIVER,
    num_partitions: int | None = None,
    column_types: str | None = None,
) -> None:
    """Staged-merge upsert: distributed write of the delta into
    ``<target>_stg``, one server-side MERGE, staging dropped. First call
    (no target yet) degrades to a plain distributed write."""
    conn = _driver_connection(spark, url)
    try:
        if not _table_exists(conn, target):
            jdbc_write(df, url, target, "overwrite", driver,
                       num_partitions, column_types)
            return
        staging = f"{target}_stg"
        jdbc_write(df, url, staging, "overwrite", driver,
                   num_partitions, column_types)
        _execute(conn, merge_sql(target, staging, df.columns, keys, preserve))
        conn.commit()
        _execute(conn, f"DROP TABLE {staging}")
        conn.commit()
    finally:
        conn.close()
