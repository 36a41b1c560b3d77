"""Edge-case tests for the temporal operators (as-of join, SCD2)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from repcheck_data_integration_spark.operators.temporal import (
    HIGH_DATE,
    asof_join,
    scd2_apply,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u", ts("2024-01-01T10:00:00")),  # after r1
            (2, "u", ts("2024-01-01T12:00:00")),  # exactly at r2 → sees r2
            (3, "u", ts("2024-01-01T08:00:00")),  # before everything → null
            (4, "v", ts("2024-01-01T23:00:00")),  # other key isolation
        ],
        ["id", "k", "t"],
    )
    right = spark.createDataFrame(
        [
            (100, "u", ts("2024-01-01T09:00:00"), 1.0),
            (101, "u", ts("2024-01-01T12:00:00"), 2.0),
            (102, "v", ts("2024-01-01T09:30:00"), 9.0),
        ],
        ["rid", "k", "t", "val"],
    )
    out = asof_join(
        left.withColumn("__tie", F.col("id")),
        right.withColumnRenamed("rid", "__tie"),
        by="k",
        left_ts="t",
        right_ts="t",
        value_cols=["val"],
        tie_col="__tie",
    )
    got = {r["id"]: r["asof_val"] for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: 9.0}


def test_scd2_new_changed_unchanged(spark):
    high = ts(HIGH_DATE.replace(" ", "T"))
    t0, t1 = ts("2020-01-01T00:00:00"), ts("2025-01-01T00:00:00")
    dim = spark.createDataFrame(
        [
            ("a", "red", t0, high, True),
            ("b", "blue", t0, high, True),
            ("b", "green", ts("2015-01-01T00:00:00"), t0, False),  # history
        ],
        ["id", "color", "valid_from", "valid_to", "is_current"],
    )
    upd = spark.createDataFrame(
        [
            ("a", "red", t1),      # unchanged → untouched
            ("b", "yellow", t1),   # changed → close + open
            ("c", "black", t1),    # brand new key → open only
        ],
        ["id", "color", "eff"],
    )
    out = scd2_apply(dim, upd, key="id", effective_col="eff",
                     compare_cols=["color"])
    rows = {(r["id"], r["color"]): r for r in out.collect()}
    assert out.count() == 5
    assert rows[("a", "red")]["is_current"] and rows[("a", "red")]["valid_to"] == high
    assert not rows[("b", "blue")]["is_current"]
    assert rows[("b", "blue")]["valid_to"] == t1  # closed at effective time
    assert rows[("b", "yellow")]["is_current"]
    assert rows[("b", "yellow")]["valid_from"] == t1
    assert rows[("c", "black")]["is_current"]
    # exactly one current row per live key
    cur = out.filter("is_current").groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_interval_point_join_edges(spark):
    """Boundary inclusion (start and end are both IN), bucket-spanning
    intervals, and points outside every interval."""
    from repcheck_data_integration_spark.operators.temporal import (
        interval_point_join,
    )

    iv = spark.createDataFrame(
        [
            # 20-day interval: spans ~4 weekly buckets
            ("long", ts("2024-01-01T00:00:00"), ts("2024-01-21T00:00:00")),
            # zero-length interval: only an exact-timestamp point matches
            ("point", ts("2024-02-01T12:00:00"), ts("2024-02-01T12:00:00")),
        ],
        ["interval_id", "s", "e"],
    )
    pts = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:00:00")),   # == start → in
            (2, ts("2024-01-21T00:00:00")),   # == end → in (inclusive)
            (3, ts("2024-01-10T05:00:00")),   # mid → in
            (4, ts("2024-01-21T00:00:01")),   # 1s past end → out
            (5, ts("2024-02-01T12:00:00")),   # matches the zero-length one
            (6, ts("2025-06-06T00:00:00")),   # matches nothing
        ],
        ["pid", "t"],
    )
    out = interval_point_join(pts, iv, point_ts="t", start_ts="s", end_ts="e")
    got = sorted((r["pid"], r["interval_id"]) for r in out.collect())
    assert got == [(1, "long"), (2, "long"), (3, "long"), (5, "point")]
    # each qualifying pair appears exactly once despite the bucket explode
    assert len(got) == len(set(got))


def test_asof_cogroup_demo_matches_native(spark):
    """The cogrouped-applyInPandas as-of demo must reproduce the native
    union-window plan's result exactly (including equal-ts tie resolution
    to the highest ref event id and NaN/null for never-matched probes)."""
    import math

    from repcheck_data_integration_spark import registry

    registry.load_all_modules()
    sf = "/root/testdata/sf0.001"
    native = {
        (r["event_id"], r["user_id"]): r["asof_value"]
        for r in registry.QUERIES["join_asof"](spark, sf).collect()
    }
    demo = {
        (r["event_id"], r["user_id"]): r["asof_value"]
        for r in registry.QUERIES["join_asof_cogroup_demo"](spark, sf).collect()
    }
    assert set(native) == set(demo)
    for k, v in native.items():
        d = demo[k]
        if v is None:
            assert d is None or math.isnan(d), k
        else:
            assert d == v, k
