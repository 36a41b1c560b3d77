"""Spark 4 Python Data Source API demo — a custom distributed source.

The reference's sources are all driver-side imperative readers (HTTP zips,
git clones, per-file loops: /root/reference/scripts/census/zip_codes.py:20-45,
people_utils.py:87-103). The Python Data Source API
(pyspark.sql.datasource, Spark 4) is the idiomatic way to turn such a
reader into a FIRST-CLASS distributed scan: the planner asks the source
for input partitions, each executor pulls only its partition, and the
result is a normal DataFrame feeding Catalyst.

`SyntheticRangeDataSource` is the deterministic stand-in (the container has
no network): N_PARTITIONS independent partitions each generate a disjoint
id range — exactly the shape a paginated-API or sharded-fetch source has.
Being deterministic, the scan is fully oracle-checkable against DuckDB's
generate_series.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import register

N_PARTITIONS = 8
ROWS_PER_PART = 1000
PYDS_SCHEMA = "id BIGINT, id_md5 STRING, bucket BIGINT"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticRangeReader(DataSourceReader):
    def partitions(self):  # planner-side: split the scan
        return [
            _RangePartition(p * ROWS_PER_PART, (p + 1) * ROWS_PER_PART)
            for p in range(N_PARTITIONS)
        ]

    def read(self, partition: _RangePartition):  # executor-side: one shard
        for i in range(partition.start, partition.end):
            yield (i, hashlib.md5(str(i).encode()).hexdigest(), i % 10)


class SyntheticRangeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_range"

    def schema(self) -> str:
        return PYDS_SCHEMA

    def reader(self, schema) -> SyntheticRangeReader:
        return SyntheticRangeReader()


_REGISTERED: set[int] = set()


def _ensure_registered(spark: SparkSession) -> None:
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(SyntheticRangeDataSource)
        _REGISTERED.add(key)


@register(
    "src_pyds_scan",
    oracle=f"""
    SELECT i AS id, md5(CAST(i AS VARCHAR)) AS id_md5, i % 10 AS bucket
    FROM generate_series(0, {N_PARTITIONS * ROWS_PER_PART - 1}) t(i)
    """,
)
def src_pyds_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through the custom Python data source: 8 planner-provided input
    partitions, executor-side generation, ordinary DataFrame out. sf_dir is
    unused — the source is synthetic by design."""
    _ensure_registered(spark)
    return spark.read.format("synthetic_range").load()


# --- streaming python data source (Spark 4 SimpleDataSourceStreamReader) --

TICKS_PER_BATCH = 100


def _make_tick_reader():
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class SyntheticTickStreamReader(SimpleDataSourceStreamReader):
        """Offset-based deterministic tick stream: each micro-batch emits
        the next TICKS_PER_BATCH ids. Implements the
        SimpleDataSourceStreamReader contract — initialOffset /
        read(start) -> (rows, nextOffset) / readBetweenOffsets for replay
        after restart (commit/stop inherit the base defaults) — exactly
        the shape of a paginated API poller or cursor-tailing CDC reader
        (the distributed, checkpointable form of the reference's
        driver-side fetch loops, scripts/census/zip_codes.py:20-45)."""

        def initialOffset(self):
            return {"next": 0}

        def _rows(self, start: int, end: int):
            return iter(
                [
                    (i, f"tick-{i % 7}", float(i % 13))
                    for i in range(start, end)
                ]
            )

        def read(self, start):
            s = start["next"]
            e = s + TICKS_PER_BATCH
            return self._rows(s, e), {"next": e}

        def readBetweenOffsets(self, start, end):
            return self._rows(start["next"], end["next"])

    return SyntheticTickStreamReader


def make_tick_source():
    """Build the DataSource class lazily (import-safe if the API moves)."""
    from pyspark.sql.datasource import DataSource

    class SyntheticTickSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_ticks"

        def schema(self):
            return "tick_id BIGINT, label STRING, value DOUBLE"

        def simpleStreamReader(self, schema):
            return _make_tick_reader()()

    return SyntheticTickSource
