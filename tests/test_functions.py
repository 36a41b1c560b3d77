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


def test_scaled_long_matches_spark_round_exactly(spark):
    """scaled_long is the drop-in for F.round(x*s, 0).cast('long') across
    every per-row hot path (round-6 sweep) — pin bit-equality against
    Spark's own round on adversarial values: negative, exact dyadic halves
    (1/128 * 1e6 = 7812.5), near-half ulp neighbors, money decimals."""
    from pyspark.sql import functions as F

    from repcheck_data_integration_spark.functions.exact import scaled_long

    vals = [
        0.0, 1.0, -1.0, 123.455, -123.455, 0.005, -0.005,
        1 / 128, -1 / 128, 0.4999999999999999, -0.4999999999999999,
        2.5e-7, -2.5e-7, 7812.5 / 1e6, -7812.5 / 1e6,
        987654.321, -987654.321, 1e-12, -1e-12,
    ]
    import random

    rng = random.Random(6)
    vals += [rng.uniform(-2, 2) for _ in range(2000)]
    vals += [rng.uniform(-200000, 200000) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    for s in (1, 100, 10000, 1000000):
        bad = (
            df.select(
                (F.round(F.col("v") * s, 0).cast("long")
                 != scaled_long(F.col("v"), s)).alias("d")
            )
            .filter("d")
            .count()
        )
        assert bad == 0, f"scale {s}: {bad} mismatches"


def test_exact_sum_floor_form_is_order_independent(spark):
    """exact_sum's floor(x*s+0.5) stays order-independent and matches the
    sequential python sum of scaled integers under any partitioning."""
    from pyspark.sql import functions as F

    from repcheck_data_integration_spark.functions.exact import exact_sum

    import math
    import random

    rng = random.Random(42)
    vals = [round(rng.uniform(-1000, 1000), 2) for _ in range(5000)]
    want = sum(math.floor(v * 100 + 0.5) for v in vals) / 100.0
    for nparts in (1, 7, 32):
        df = spark.createDataFrame([(v,) for v in vals], ["v"]).repartition(
            nparts
        )
        got = df.agg(exact_sum(F.col("v")).alias("s")).collect()[0]["s"]
        assert got == want, (nparts, got, want)


def test_gini_ranksum_no_bigint_wrap(spark):
    """VERDICT r9 #1: Spark's DIV returns BIGINT even on DECIMAL operands,
    so the round-9 form ``(dec(cnt)*(cnt+1)) DIV 2`` wrapped at cnt≈4.3e9
    (cnt=5e9 → -5946744071209551616). The fixed _gini_ranksum_expr halves
    the even factor in LONG before the one decimal multiply — exact at
    both parities of a 5e9-row tie group, no 5e9-row fixture needed."""
    from repcheck_data_integration_spark.operators.aggregates import (
        _gini_ranksum_expr,
    )

    cases = [
        # (cnt, off_cnt, exact cnt*off + cnt*(cnt+1)//2 from python ints)
        (5_000_000_000, 0),
        (5_000_000_001, 0),
        (5_000_000_000, 4_999_999_999),
        (4_294_967_296, 123_456_789),  # first wrapping magnitude
        (3, 2),
        (1, 0),
    ]
    df = spark.createDataFrame(
        [(c, o) for c, o in cases], "cnt long, off_cnt long"
    )
    rows = df.select(
        "cnt", "off_cnt", _gini_ranksum_expr().alias("rs")
    ).collect()
    for r in rows:
        want = r["cnt"] * r["off_cnt"] + r["cnt"] * (r["cnt"] + 1) // 2
        assert int(r["rs"]) == want, (r["cnt"], r["off_cnt"], r["rs"], want)
        assert int(r["rs"]) > 0
