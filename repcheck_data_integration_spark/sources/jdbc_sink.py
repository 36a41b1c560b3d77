"""Keyed-upsert database sink (snk_jdbc).

The reference's single sink is a row-wise Postgres ``INSERT … ON CONFLICT
(pk) DO UPDATE`` executed over psycopg2 (reference
scripts/database/database.py:52-73; connection :30-39), with ``created_at``
popped from the update set so it survives updates (:68).

Spark-first split of that sink into three layers, each testable on its own:

1. :func:`upsert_sql` — pure SQL generation for the ON CONFLICT statement
   (dialect-parameterized placeholders; Postgres and SQLite share the
   ON CONFLICT grammar).
2. :func:`write_dbapi_upsert` — the distributed writer:
   ``df.foreachPartition`` opens one DB-API connection per partition and
   executes the statement in bounded ``executemany`` batches. This is the
   shape that scales: N executors push N partitions concurrently, memory
   bounded by batch_size, no driver collect. Exercised end-to-end in tests
   against stdlib sqlite3 (the embedded target this container ships).
3. :func:`write_jdbc_upsert` (file_sources.py) — the Spark-JDBC leg for
   engines reachable over JDBC: stage with ``merge_upsert`` against a read
   of the target, write back. Needs a server, so only the staging half is
   testable here.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

from pyspark.sql import DataFrame

_PLACEHOLDERS = {"postgres": "%s", "sqlite": "?"}


def upsert_sql(
    table: str,
    cols: Sequence[str],
    keys: Sequence[str],
    preserve: Sequence[str] = ("created_at",),
    dialect: str = "postgres",
) -> str:
    """The reference's upsert statement (database.py:52-73): insert every
    column; on key conflict update every non-key column EXCEPT the
    preserved ones (created_at survives updates, :68). Parameterized —
    values always bind as placeholders, never inline."""
    ph = _PLACEHOLDERS[dialect]
    missing = [k for k in keys if k not in cols]
    if missing:
        raise ValueError(f"key columns absent from cols: {missing}")
    collist = ", ".join(cols)
    phlist = ", ".join([ph] * len(cols))
    keylist = ", ".join(keys)
    updates = [
        f"{c} = EXCLUDED.{c}"
        for c in cols
        if c not in keys and c not in preserve
    ]
    if not updates:  # pure insert-if-absent
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({phlist}) "
            f"ON CONFLICT ({keylist}) DO NOTHING"
        )
    setlist = ", ".join(updates)
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({phlist}) "
        f"ON CONFLICT ({keylist}) DO UPDATE SET {setlist}"
    )


def executemany_batched(
    cursor,
    sql: str,
    rows: Iterable[tuple],
    batch_size: int = 1000,
) -> int:
    """Drain ``rows`` through ``cursor.executemany`` in bounded batches
    (the reference commits row-at-a-time, database.py:71-73; batching is
    the set-based equivalent — bounded memory, one round-trip per batch).
    Returns the number of rows written."""
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    n = 0
    batch: list[tuple] = []
    for row in rows:
        batch.append(row)
        if len(batch) >= batch_size:
            cursor.executemany(sql, batch)
            n += len(batch)
            batch = []
    if batch:
        cursor.executemany(sql, batch)
        n += len(batch)
    return n


def write_dbapi_upsert(
    df: DataFrame,
    conn_factory: Callable[[], object],
    table: str,
    keys: Sequence[str],
    preserve: Sequence[str] = ("created_at",),
    dialect: str = "postgres",
    batch_size: int = 1000,
) -> None:
    """Distributed keyed upsert through any DB-API driver: one connection
    per partition (opened ON the executor — ``conn_factory`` must be
    picklable), batched ON CONFLICT statements, commit per partition.
    Last-writer-wins WITHIN a partition follows row order; across
    partitions the database's own conflict handling decides, same as the
    reference's row loop under concurrency."""
    cols = list(df.columns)
    sql = upsert_sql(table, cols, keys, preserve=preserve, dialect=dialect)

    def write_partition(rows) -> None:
        conn = conn_factory()
        try:
            cur = conn.cursor()
            executemany_batched(
                cur, sql, (tuple(r) for r in rows), batch_size=batch_size
            )
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(write_partition)
