"""Unit tests for scalar kernels that DuckDB can't oracle."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from repcheck_data_integration_spark.functions.kernels import (
    multi_format_timestamp,
    normalize_division_id,
    unaccent,
    uuid5,
)


def test_uuid5_matches_stdlib(spark):
    names = ["bill_118_hr1", "ocd-division/country:us", "", "héllo wörld", "a_b_c"]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        r["name"]: r["u"]
        for r in df.select("name", uuid5(F.col("name")).alias("u")).collect()
    }
    for n in names:
        assert got[n] == str(uuid.uuid5(uuid.NAMESPACE_OID, n)), n


def test_unaccent(spark):
    df = spark.createDataFrame([("éàüñç",), ("plain",), (None,)], ["s"])
    rows = df.select(unaccent(F.col("s")).alias("u")).collect()
    assert [r["u"] for r in rows] == ["eaunc", "plain", None]


def test_normalize_division_id(spark):
    df = spark.createDataFrame(
        [("ocd-jurisdiction/country:us/government",)], ["s"]
    )
    out = df.select(normalize_division_id(F.col("s")).alias("o")).collect()[0]["o"]
    # reference: scripts/utils.py:3-6
    assert out == "ocd-division/country:us"


def test_multi_format_timestamp(spark):
    df = spark.createDataFrame(
        [("2020-01-02",), ("2020-01-02 03:04:05",), ("garbage",)], ["s"]
    )
    out = [
        r["t"]
        for r in df.select(
            multi_format_timestamp(
                F.col("s"), ["yyyy-MM-dd", "yyyy-MM-dd HH:mm:ss"]
            ).alias("t")
        ).collect()
    ]
    assert out[0] is not None and out[1] is not None and out[2] is None


def test_zorder_key_is_morton_code(spark):
    """zkey must equal the reference bit-interleaving (x bits at even
    positions, y bits at odd)."""
    from repcheck_data_integration_spark.operators.spatial import zorder_key
    from pyspark.sql import functions as F

    def morton(x, y, bits=8):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (96, 88), (255, 255)]
    df = spark.createDataFrame(pairs, ["x", "y"]).select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    assert got == {(x, y): morton(x, y) for x, y in pairs}
