"""Temporal operators: as-of join and SCD2 dimension maintenance.

Neither exists natively in Spark (pyspark guide 'Common OLAP patterns'); both
are staples of the ETL surface this engine targets.

- **as-of join**: for each left row, the most recent right row with
  right.ts <= left.ts within the same key. Implemented as union → single
  window (last_value ignore-nulls over the interleaved timeline) — one
  shuffle on the key, no per-group pandas, no range explosion. This is the
  scalable form of pandas.merge_asof.
- **SCD2 apply**: fold a batch of keyed updates into a
  slowly-changing-dimension table with [valid_from, valid_to) intervals and
  an is_current flag — the temporal upgrade of snk_upsert (the reference
  overwrites history; database.py:52-73).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..functions.exact import scaled_long
from ..tables import load

# SCD2 open-row sentinel. NOT 9999-12-31: the driver canonicalizes results
# through pandas ns-datetime, whose max is 2262-04-11 — the classic sentinel
# raises OutOfBoundsDatetime there (round-3 snk_scd2 failure). 2200-01-01 is
# comfortably inside ns range on both the Spark and DuckDB-oracle sides.
HIGH_DATE = "2200-01-01 00:00:00"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """left + (for each left row) the latest right row with
    right_ts <= left_ts, matched within ``by``. ``tie_col`` orders
    same-timestamp rows deterministically (right rows sort before left rows
    at equal ts, so an exactly-simultaneous right row IS visible)."""
    lt = left.select(
        F.col(by).alias("__by"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        F.col(tie_col).alias("__tie"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    rt = right.select(
        F.col(by).alias("__by"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        F.col(tie_col).alias("__tie"),
        F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    w = (
        W.partitionBy("__by")
        .orderBy("__ts", "__is_probe", "__tie")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "__is_probe",
        "__l",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    probes = carried.filter(F.col("__is_probe") == 1)
    return probes.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"asof_{c}") for c in value_cols],
    )


@register(
    "join_asof",
    oracle="""
    WITH probes AS (
        SELECT event_id, user_id, ts FROM events WHERE event_id % 10 = 0),
    refs AS (
        SELECT event_id AS ref_event_id, user_id, ts, value
        FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           (SELECT r.value FROM refs r
            WHERE r.user_id = p.user_id AND r.ts <= p.ts
            ORDER BY r.ts DESC, r.ref_event_id DESC LIMIT 1) AS asof_value
    FROM probes p
    """,
)
def join_asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join demo: every 10th event looks up the user's most recent
    'click' value at-or-before its timestamp. The oracle states it as a
    correlated top-1 subquery; the engine runs the union-window form (one
    shuffle, no correlation)."""
    e = load(spark, sf_dir, "events")
    probes = e.filter(F.col("event_id") % 10 == 0).select(
        "event_id", "user_id", "ts"
    )
    refs = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", F.col("event_id").alias("ref_tie")
    )
    out = asof_join(
        probes.withColumn("__probe_tie", F.col("event_id")),
        refs.withColumnRenamed("ref_tie", "__probe_tie"),
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        tie_col="__probe_tie",
    )
    return out.select(
        "event_id", "user_id", F.col("asof_value").alias("asof_value")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    effective_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Fold keyed updates into an SCD2 dimension.

    ``dim``: (key, compare_cols..., valid_from, valid_to, is_current).
    ``updates``: (key, compare_cols..., effective_col).
    Changed/new keys close the current row at the update's effective time
    and open a new current row; unchanged keys pass through untouched.
    """
    # Column-RENAMED update side (no DataFrame aliases): alias-qualified
    # resolution breaks when scd2_apply is CHAINED — the second fold's dim
    # already contains a join with the same alias names in its lineage
    # (ambiguous-attribute AnalysisException). Unique physical names make
    # the fold safely composable: scd2_apply(scd2_apply(dim, b0), b1) is
    # exactly the multi-epoch incremental path (streaming/stream_ops.py).
    upd = updates.select(
        F.col(key).alias("__u_key"),
        *[F.col(c).alias(f"__u_{c}") for c in compare_cols],
        F.col(effective_col).alias("__eff"),
    )
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    changed_cond = F.lit(False)
    for c in compare_cols:
        changed_cond = changed_cond | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))

    joined = cur.join(upd, F.col(key) == F.col("__u_key"), "full_outer")
    # rows whose current version survives (no update, or identical update)
    untouched = joined.filter(
        F.col("__eff").isNull() | ~changed_cond
    ).select(*dim.columns)
    # close the superseded versions
    closed = (
        joined.filter(F.col("__eff").isNotNull() & changed_cond)
        .filter(F.col("valid_from").isNotNull())
        .select(
            F.col(key),
            *[F.col(c) for c in compare_cols],
            "valid_from",
            F.col("__eff").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    # open the new current versions (changed or brand-new keys)
    opened = (
        joined.filter(F.col("__eff").isNotNull() & changed_cond)
        .select(
            F.coalesce(F.col("__u_key"), F.col(key)).alias(key),
            *[F.col(f"__u_{c}").alias(c) for c in compare_cols],
            F.col("__eff").alias("valid_from"),
            F.lit(HIGH_DATE).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return (
        hist.unionByName(untouched)
        .unionByName(closed.select(*dim.columns))
        .unionByName(opened.select(*dim.columns))
    )


@register(
    "snk_scd2",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
               TIMESTAMP '{HIGH_DATE}' AS valid_to,
               true AS is_current
        FROM customer),
    upd AS (
        SELECT c_custkey, 'PIVOTED' AS c_mktsegment,
               TIMESTAMP '2025-06-01 00:00:00' AS eff
        FROM customer WHERE c_custkey % 5 = 0),
    joined AS (SELECT d.*, u.c_mktsegment AS u_seg, u.eff
               FROM dim d LEFT JOIN upd u USING (c_custkey)),
    untouched AS (
        SELECT c_custkey, c_mktsegment, valid_from, valid_to, is_current
        FROM joined WHERE eff IS NULL OR u_seg = c_mktsegment),
    closed AS (
        SELECT c_custkey, c_mktsegment, valid_from, eff AS valid_to,
               false AS is_current
        FROM joined WHERE eff IS NOT NULL AND u_seg <> c_mktsegment),
    opened AS (
        SELECT c_custkey, u_seg AS c_mktsegment, eff AS valid_from,
               TIMESTAMP '{HIGH_DATE}' AS valid_to, true AS is_current
        FROM joined WHERE eff IS NOT NULL AND u_seg <> c_mktsegment)
    SELECT * FROM untouched UNION ALL
    SELECT * FROM closed UNION ALL
    SELECT * FROM opened
    """,
)
def snk_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 demo: every 5th customer's segment changes effective 2025-06-01 —
    the old version closes, a new current version opens, everyone else
    passes through."""
    c = load(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(HIGH_DATE).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = c.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.lit("PIVOTED").alias("c_mktsegment"),
        F.lit("2025-06-01 00:00:00").cast("timestamp").alias("eff"),
    )
    return scd2_apply(
        dim, upd, key="c_custkey", effective_col="eff",
        compare_cols=["c_mktsegment"],
    )


# ---------------------------------------------------------------------------
# Bucketed interval range join
# ---------------------------------------------------------------------------

BUCKET_SECS = 7 * 86400  # one-week join buckets


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_ts <= point_ts <= end_ts`` — WITHOUT the naive cross-join a
    theta-join degenerates to. Both sides get a coarse time-bucket key
    (intervals explode to one row per overlapped bucket, points to exactly
    one), the join becomes an equi-join on the bucket + an exact range
    refinement, and each qualifying (point, interval) pair appears exactly
    once because the point lives in a single bucket.

    This is the 1-D sibling of the spatial grid join
    (operators/spatial.py): shuffle cost scales with interval length /
    bucket width, not |points| × |intervals|. Pick ``BUCKET_SECS`` ≈ the
    typical interval length so most intervals expand to 1-2 buckets.
    """
    bucket = lambda c: F.floor(F.unix_timestamp(F.col(c)) / BUCKET_SECS)  # noqa: E731
    ib = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket(start_ts), bucket(end_ts))),
    )
    pb = points.withColumn("__bucket", bucket(point_ts))
    return pb.join(ib, "__bucket").filter(
        F.col(point_ts).between(F.col(start_ts), F.col(end_ts))
    ).drop("__bucket")


@register(
    "join_range_interval",
    oracle="""
    WITH iv AS (
        SELECT o_orderkey AS interval_id, o_orderdate AS start_ts,
               o_orderdate + (o_orderkey % 30) * INTERVAL 1 DAY AS end_ts
        FROM orders WHERE o_orderkey % 97 = 0)
    SELECT iv.interval_id, iv.start_ts, iv.end_ts,
           count(*) AS n_points
    FROM iv JOIN lineitem l ON l.l_shipdate BETWEEN iv.start_ts AND iv.end_ts
    GROUP BY 1, 2, 3
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-join demo: ship events counted into sparse variable-length
    order windows. The oracle states the plain theta range join; the
    engine runs the bucketed equi-join form (intervals here span 0-29
    days, so each expands to at most 5 weekly buckets)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    iv = o.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("interval_id"),
        F.col("o_orderdate").alias("start_ts"),
        (
            F.col("o_orderdate")
            + F.expr("make_dt_interval(CAST(o_orderkey % 30 AS INT))")
        ).alias("end_ts"),
    )
    pts = li.select(F.col("l_shipdate").alias("pt_ts"))
    joined = interval_point_join(
        pts, iv, point_ts="pt_ts", start_ts="start_ts", end_ts="end_ts"
    )
    return joined.groupBy("interval_id", "start_ts", "end_ts").agg(
        F.count(F.lit(1)).alias("n_points")
    )


# ---------------------------------------------------------------------------
# Time-spine gap filling (hypertable time_bucket_gapfill + locf)
# ---------------------------------------------------------------------------

SPINE_USERS = 5  # user_id < 5 keeps the demo spine small; shape is general


@register(
    "ts_gap_fill",
    oracle=f"""
    WITH bounds AS (
        SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS t0,
               CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS t1
        FROM events),
    spine AS (
        SELECT u.user_id, s.slot
        FROM (SELECT DISTINCT user_id FROM events
              WHERE user_id < {SPINE_USERS}) u,
             (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS slot
              FROM bounds) s)
    SELECT sp.user_id, sp.slot,
           (SELECT e.value FROM events e
            WHERE e.user_id = sp.user_id AND e.ts <= sp.slot
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS filled_value
    FROM spine sp
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine gap filling with last-observation-carried-forward (the
    time_bucket_gapfill + locf pair of time-series stores): build the
    dense hourly spine (users × hours — generated, never scanned), then
    forward-fill each empty slot from the user's latest event at-or-before
    it. The fill is the SAME union+window as-of machinery as join_asof —
    one shuffle on user_id, no correlated per-slot lookups (the oracle
    states it as the correlated form). Slots before a user's first event
    stay NULL, exactly like the SQL."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    users = (
        e.filter(F.col("user_id") < SPINE_USERS).select("user_id").distinct()
    )
    spine = users.join(F.broadcast(bounds)).select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("t0"), F.col("t1"), F.expr("INTERVAL 1 HOUR")
            )
        ).alias("slot"),
    )
    refs = e.filter(F.col("user_id") < SPINE_USERS).select(
        "user_id", "ts", "value", F.col("event_id").alias("__probe_tie")
    )
    out = asof_join(
        spine.withColumn("__probe_tie", F.lit(None).cast("long")),
        refs,
        by="user_id",
        left_ts="slot",
        right_ts="ts",
        value_cols=["value"],
        tie_col="__probe_tie",
    )
    return out.select(
        "user_id", "slot", F.col("asof_value").alias("filled_value")
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH probes AS (
        SELECT event_id, user_id, ts FROM events WHERE event_id % 10 = 0),
    refs AS (
        SELECT event_id AS ref_event_id, user_id, ts, value
        FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           (SELECT r.value FROM refs r
            WHERE r.user_id = p.user_id AND r.ts >= p.ts
            ORDER BY r.ts ASC, r.ref_event_id ASC LIMIT 1) AS next_value
    FROM probes p
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'): each
    probe finds the user's EARLIEST click at-or-after its timestamp. Runs
    through the same union-window machinery by negating the time axis
    (epoch seconds × -1) — min(ts ≥ probe) in real time is max(-ts ≤
    -probe) in negated time — and negating the tie column so equal-ts
    rights resolve to the LOWEST event id, exactly the oracle's ASC/ASC
    top-1. Same single shuffle on the key, no correlated lookup."""
    e = load(spark, sf_dir, "events")
    neg_ts = (-F.col("ts").cast("double")).alias("__nts")
    probes = e.filter(F.col("event_id") % 10 == 0).select(
        "event_id", "user_id", "ts", neg_ts,
        (-F.col("event_id")).alias("__probe_tie"),
    )
    refs = e.filter(F.col("event_type") == "click").select(
        "user_id", neg_ts, "value",
        (-F.col("event_id")).alias("__probe_tie"),
    )
    out = asof_join(
        probes,
        refs,
        by="user_id",
        left_ts="__nts",
        right_ts="__nts",
        value_cols=["value"],
        tie_col="__probe_tie",
    )
    return out.select(
        "event_id", "user_id", F.col("asof_value").alias("next_value")
    )


ASOF_TOL_S = 3600  # accept backward matches at most one hour old


@register(
    "join_asof_tolerance",
    oracle=f"""
    WITH probes AS (
        SELECT event_id, user_id, ts FROM events WHERE event_id % 10 = 0),
    refs AS (
        SELECT event_id AS ref_event_id, user_id, ts, value
        FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           (SELECT r.value FROM refs r
            WHERE r.user_id = p.user_id AND r.ts <= p.ts
              AND r.ts >= p.ts - INTERVAL {ASOF_TOL_S} SECOND
            ORDER BY r.ts DESC, r.ref_event_id DESC LIMIT 1) AS asof_value
    FROM probes p
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (merge_asof's ``tolerance=``): the
    latest click at-or-before the probe counts only when it is at most
    {ASOF_TOL_S}s old — staler state is NULL, the standard guard against
    joining against a sensor/price last heard from hours ago. The carried
    reference timestamp rides the same window pass as the value (one extra
    carried column, zero extra shuffles); the bound is applied as a plain
    projection afterwards."""
    e = load(spark, sf_dir, "events")
    probes = e.filter(F.col("event_id") % 10 == 0).select(
        "event_id", "user_id", "ts", F.col("event_id").alias("__probe_tie")
    )
    refs = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", F.col("event_id").alias("__probe_tie")
    )
    out = asof_join(
        probes,
        refs,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value", "ts"],
        tie_col="__probe_tie",
    )
    fresh = (
        F.col("asof_ts").cast("double")
        >= F.col("ts").cast("double") - ASOF_TOL_S
    )
    return out.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("asof_value")).alias("asof_value"),
    )


@register(
    "ts_resample_ohlc",
    oracle="""
    WITH r AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, value,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events)
    SELECT event_type, hour,
           CAST(count(*) AS BIGINT) AS n_events,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0
                AS DOUBLE) AS volume
    FROM r GROUP BY event_type, hour
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream to hourly OHLC bars per event_type —
    the canonical time-series resample (metrics rollups, market bars).
    Open/close are SELECTIONS of raw values under a total order
    (ts, event_id — event_id breaks equal-timestamp ties), never
    arithmetic, so they're engine-exact; volume sums scaled-integer cents
    (functions/exact.py rule). Plan: ONE shuffle — both row_numbers share
    a window partition equal to the groupBy key, so the aggregate reuses
    the window's hash partitioning (asserted in test_plan_shapes)."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
        "ts",
        "event_id",
    )
    # partition the windows by the MATERIALIZED hour attribute (not the
    # date_trunc expression) so the downstream groupBy on the same
    # attributes reuses the window's hash partitioning — one exchange,
    # verified in test_plan_shapes.
    wp = W.partitionBy("event_type", "hour")
    rn_a = F.row_number().over(wp.orderBy(F.col("ts").asc(), F.col("event_id").asc()))
    rn_d = F.row_number().over(wp.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
    r = e.select(
        "event_type",
        "hour",
        "value",
        rn_a.alias("rn_a"),
        rn_d.alias("rn_d"),
    )
    return r.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        (F.sum(scaled_long(F.col("value"), 100)) / 100.0)
        .cast("double")
        .alias("volume"),
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH l AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate AS s,
               l_shipdate + INTERVAL ((CAST(l_quantity AS INT) % 20) + 1) DAY
                   AS e
        FROM lineitem)
    SELECT a.l_orderkey AS o1, a.l_linenumber AS ln1,
           b.l_orderkey AS o2, b.l_linenumber AS ln2,
           a.l_partkey AS part,
           CAST(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1
                AS BIGINT) AS overlap_days
    FROM l a JOIN l b
      ON a.l_partkey = b.l_partkey
     AND (a.l_orderkey < b.l_orderkey
          OR (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber))
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval OVERLAP join (the general range join, beyond the
    point-in-interval join_range_interval): pairs of same-part shipments
    whose transit windows [shipdate, shipdate + transit] intersect —
    co-shipment conflict detection. Transit is synthesized
    deterministically from quantity (the slim fixture has no receiptdate).

    Scale shape — the reason this op exists: a naive interval join is
    per-key quadratic (exactly what the DuckDB oracle does). The Spark
    plan GRIDS time into months and equi-joins on (partkey, month-cell):
    each interval lands in ≤2 cells (transit ≤ 21 days), candidate work is
    ∝ co-located rows per cell, and every overlapping pair is counted
    exactly once at its REFERENCE CELL — the month of the later start,
    which both intervals contain by definition of overlap (the same
    cell-dedup trick as join_spatial). At 100 TB the cell width tracks the
    interval length so the per-cell population stays bounded; skewed hot
    months split with AQE skew-join handling."""
    li = load(spark, sf_dir, "lineitem")
    transit = (F.col("l_quantity").cast("int") % 20) + 1
    l = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.col("l_shipdate").alias("s"),
        F.date_add(F.col("l_shipdate"), transit).alias("e"),
    )
    mi = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    cells = l.withColumn("cell", F.explode(F.sequence(mi(F.col("s")), mi(F.col("e")))))
    a, b = cells.alias("a"), cells.alias("b")
    pair_lt = (F.col("a.l_orderkey") < F.col("b.l_orderkey")) | (
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
    )
    later_start = F.greatest(F.col("a.s"), F.col("b.s"))
    return (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.cell") == F.col("b.cell"))
            & pair_lt
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .filter(F.col("a.cell") == mi(later_start))
        .select(
            F.col("a.l_orderkey").alias("o1"),
            F.col("a.l_linenumber").alias("ln1"),
            F.col("b.l_orderkey").alias("o2"),
            F.col("b.l_linenumber").alias("ln2"),
            F.col("a.l_partkey").alias("part"),
            (
                F.datediff(
                    F.least(F.col("a.e"), F.col("b.e")), later_start
                )
                + 1
            )
            .cast("long")
            .alias("overlap_days"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH probes AS (
        SELECT event_id, user_id, ts FROM events WHERE event_id % 10 = 0),
    refs AS (
        SELECT event_id AS ref_event_id, user_id, ts, value
        FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           (SELECT r.value FROM refs r WHERE r.user_id = p.user_id
            ORDER BY abs(epoch(r.ts) - epoch(p.ts)) ASC,
                     (r.ts > p.ts) ASC, r.ref_event_id ASC
            LIMIT 1) AS nearest_value
    FROM probes p
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest',
    completing the backward/forward/tolerance family): each probe takes
    whichever of its latest-backward / earliest-forward click is closer in
    time, ties to the backward side, then to the lowest event id.

    Runs as the two existing single-shuffle as-of passes (backward, and
    forward via the negated time axis) carrying the matched ref timestamp
    alongside the value, then one probe-keyed join picks the closer side —
    three key-partitioned shuffles total, still no correlated per-row
    lookups (the oracle's subquery form is the naive statement). Both
    passes tie-break toward the LOWEST ref event id (tie col = -event_id)
    so the choice matches the oracle's global ASC ordering."""
    e = load(spark, sf_dir, "events")
    tsd = F.col("ts").cast("double")
    probes = e.filter(F.col("event_id") % 10 == 0).select(
        "event_id",
        "user_id",
        tsd.alias("__tsd"),
        (-F.col("event_id")).alias("__tie"),
    )
    refs = e.filter(F.col("event_type") == "click").select(
        "user_id",
        tsd.alias("__tsd"),
        "value",
        tsd.alias("__rts"),
        (-F.col("event_id")).alias("__tie"),
    )
    back = asof_join(
        probes, refs, by="user_id", left_ts="__tsd", right_ts="__tsd",
        value_cols=["value", "__rts"], tie_col="__tie",
    )
    probes_f = probes.select(
        "event_id", "user_id", "__tsd", (-F.col("__tsd")).alias("__nts"), "__tie"
    )
    refs_f = refs.select(
        "user_id", (-F.col("__tsd")).alias("__nts"), "value", "__rts", "__tie"
    )
    fwd = asof_join(
        probes_f, refs_f, by="user_id", left_ts="__nts", right_ts="__nts",
        value_cols=["value", "__rts"], tie_col="__tie",
    )
    b = back.select(
        "event_id",
        "user_id",
        F.col("__tsd").alias("__ptsd"),
        F.col("asof_value").alias("__bv"),
        F.col("asof___rts").alias("__brts"),
    )
    f = fwd.select(
        F.col("event_id").alias("__eid_f"),
        F.col("asof_value").alias("__fv"),
        F.col("asof___rts").alias("__frts"),
    )
    j = b.join(f, b["event_id"] == f["__eid_f"])
    bdiff = F.col("__ptsd") - F.col("__brts")
    fdiff = F.col("__frts") - F.col("__ptsd")
    nearest = (
        F.when(F.col("__brts").isNull(), F.col("__fv"))
        .when(F.col("__frts").isNull(), F.col("__bv"))
        .when(bdiff <= fdiff, F.col("__bv"))
        .otherwise(F.col("__fv"))
    )
    return j.select("event_id", "user_id", nearest.alias("nearest_value"))


@register("join_asof_cogroup_demo")
def join_asof_cogroup_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fifth §2.8 UDF vehicle — cogrouped applyInPandas: both relations
    shuffle on the key, each key's pair of pandas frames meets in one
    Python call, and pandas.merge_asof performs the per-user backward
    as-of merge. Rows-only by design (a demo of the vehicle — the
    REGISTERED as-of operator is the native single-shuffle union-window
    plan, join_asof); hash parity with that native plan is asserted in
    tests/test_temporal.py, same native-first policy as
    win_grouped_zscore_pandas_demo.

    Scale note: like every applyInPandas, a whole key group materializes
    in one pandas frame — fine for per-user event history, a scale-killer
    for billion-row keys; the native plan has no such cliff, which is why
    it owns the registration."""
    import pandas as pd

    e = load(spark, sf_dir, "events")
    probes = e.filter(F.col("event_id") % 10 == 0).select(
        "event_id", "user_id", "ts"
    )
    refs = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("ref_event_id"), "user_id", "ts", "value"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "asof_value": []}
            ).astype({"event_id": "int64", "user_id": "int64", "asof_value": "float64"})
        left = left.sort_values(["ts", "event_id"])
        if right.empty:
            out = left[["event_id", "user_id"]].copy()
            out["asof_value"] = float("nan")
            return out
        # equal-ts rights resolve to the HIGHEST ref_event_id (merge_asof
        # takes the last sorted row), matching the native plan's tie rule
        right = right.sort_values(["ts", "ref_event_id"])
        out = pd.merge_asof(
            left, right[["ts", "value"]], on="ts", direction="backward"
        )
        out = out.rename(columns={"value": "asof_value"})
        return out[["event_id", "user_id", "asof_value"]]

    return (
        probes.groupBy("user_id")
        .cogroup(refs.groupBy("user_id"))
        .applyInPandas(merge, schema="event_id long, user_id long, asof_value double")
    )


@register(
    "join_pit_scd2",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
               CASE WHEN c_custkey % 5 = 0
                    THEN TIMESTAMP '2025-06-01 00:00:00'
                    ELSE TIMESTAMP '{HIGH_DATE}' END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, 'PIVOTED' AS c_mktsegment,
               TIMESTAMP '2025-06-01 00:00:00' AS valid_from,
               TIMESTAMP '{HIGH_DATE}' AS valid_to
        FROM customer WHERE c_custkey % 5 = 0),
    facts AS (
        SELECT o_orderkey, o_custkey,
               TIMESTAMP '2025-01-01 00:00:00'
                   + INTERVAL (o_orderkey % 365) DAY AS fact_ts
        FROM orders)
    SELECT f.o_orderkey, f.o_custkey, f.fact_ts,
           d.c_mktsegment AS segment_at_fact
    FROM facts f JOIN dim d
      ON d.c_custkey = f.o_custkey
     AND f.fact_ts >= d.valid_from AND f.fact_ts < d.valid_to
    """,
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join against the SCD2 dimension (the consumer side of
    snk_scd2, and the feature-store correctness primitive: a fact must see
    the dimension AS OF its own timestamp, never today's row — the classic
    training-serving leakage bug). Versioned dim = baseline interval plus
    the post-2025-06-01 'PIVOTED' version for every 5th customer; fact
    timestamps synthesized to straddle the boundary, so both versions are
    actually selected.

    Plan shape: an EQUI-join on the customer key with the interval bounds
    as residual filters — correct because SCD2 guarantees few,
    non-overlapping versions per key (candidates per fact = its key's
    version count, bounded), so no time-bucketing is needed; contrast
    join_range_interval, which buckets because its intervals share no
    equality key. [valid_from, valid_to) half-open semantics make the
    version choice unique at the boundary instant."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    base = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.when(
            F.col("c_custkey") % 5 == 0,
            F.lit("2025-06-01 00:00:00").cast("timestamp"),
        )
        .otherwise(F.lit(HIGH_DATE).cast("timestamp"))
        .alias("valid_to"),
    )
    pivoted = c.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.lit("PIVOTED").alias("c_mktsegment"),
        F.lit("2025-06-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(HIGH_DATE).cast("timestamp").alias("valid_to"),
    )
    dim = base.unionByName(pivoted)
    facts = o.select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "TIMESTAMP '2025-01-01 00:00:00'"
            " + make_interval(0, 0, 0, o_orderkey % 365, 0, 0, 0)"
        ).alias("fact_ts"),
    )
    return facts.join(
        dim,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("fact_ts") >= F.col("valid_from"))
        & (F.col("fact_ts") < F.col("valid_to")),
    ).select(
        "o_orderkey", "o_custkey", "fact_ts",
        F.col("c_mktsegment").alias("segment_at_fact"),
    )


# --------------------------------------------------------------------------
# temporal_align_segments — merge two SCD2 validity histories
# --------------------------------------------------------------------------

_TA_BASE = "2020-01-01 00:00:00"
_TA_SEG_PIVOT = "2025-06-01 00:00:00"
_TA_BAND_PIVOT = "2023-01-01 00:00:00"


@register(
    "temporal_align_segments",
    oracle=f"""
    WITH hist_a AS (
        SELECT c_custkey AS k, c_mktsegment AS attr_a,
               TIMESTAMP '{_TA_BASE}' AS vf,
               CASE WHEN c_custkey % 5 = 0
                    THEN TIMESTAMP '{_TA_SEG_PIVOT}'
                    ELSE TIMESTAMP '{HIGH_DATE}' END AS vt
        FROM customer
        UNION ALL
        SELECT c_custkey, 'PIVOTED',
               TIMESTAMP '{_TA_SEG_PIVOT}', TIMESTAMP '{HIGH_DATE}'
        FROM customer WHERE c_custkey % 5 = 0),
    hist_b AS (
        SELECT c_custkey AS k, 'OLD' AS attr_b,
               TIMESTAMP '{_TA_BASE}' AS vf,
               CASE WHEN c_custkey % 3 = 0
                    THEN TIMESTAMP '{_TA_BAND_PIVOT}'
                    ELSE TIMESTAMP '{HIGH_DATE}' END AS vt
        FROM customer
        UNION ALL
        SELECT c_custkey, 'NEW',
               TIMESTAMP '{_TA_BAND_PIVOT}', TIMESTAMP '{HIGH_DATE}'
        FROM customer WHERE c_custkey % 3 = 0),
    bounds AS (
        SELECT DISTINCT k, vf AS b FROM hist_a
        UNION SELECT DISTINCT k, vt FROM hist_a
        UNION SELECT DISTINCT k, vf FROM hist_b
        UNION SELECT DISTINCT k, vt FROM hist_b),
    segs AS (
        SELECT k, b AS seg_from,
               lead(b) OVER (PARTITION BY k ORDER BY b) AS seg_to
        FROM bounds),
    live AS (
        SELECT k, seg_from, seg_to FROM segs WHERE seg_to IS NOT NULL)
    SELECT s.k AS c_custkey, s.seg_from, s.seg_to, a.attr_a, b.attr_b
    FROM live s
    JOIN hist_a a
      ON s.k = a.k AND s.seg_from >= a.vf AND s.seg_from < a.vt
    JOIN hist_b b
      ON s.k = b.k AND s.seg_from >= b.vf AND s.seg_from < b.vt
    """,
)
def temporal_align_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-temporal history alignment: two independent SCD2 validity
    histories of the same entity (market segment from one system, a
    balance band from another) are merged into the REFINED segmentation —
    one row per (key, maximal interval on which BOTH attributes are
    constant). This is the temporal-warehouse join that turns
    per-attribute histories into a single versioned dimension a
    point-in-time join (join_pit_scd2) can consume; the reference's
    whole-row upsert (database.py:52-73) cannot express it.

    Sweep construction: per key, the DISTINCT union of both histories'
    boundaries, lead() to form half-open segments, then each segment
    start instant point-in-time-joins BOTH histories (equi-join on the
    key with interval residuals — SCD2 guarantees few non-overlapping
    versions per key, so no bucketing is needed). Both fixture histories
    cover [base, {HIGH_DATE}) with no gaps, so every segment resolves
    both attributes and the inner joins are total.

    Scale: all four relations are key-partitioned; one shuffle serves
    the boundary window, and the two PIT joins are key-equi-joins with
    per-key candidate counts bounded by version counts (<=3 here). Output
    is the refined history: Σ per-key (|A versions| + |B versions| - 1)
    rows, never a cross product.
    """
    c = load(spark, sf_dir, "customer")
    base = F.lit(_TA_BASE).cast("timestamp")
    high = F.lit(HIGH_DATE).cast("timestamp")
    seg_piv = F.lit(_TA_SEG_PIVOT).cast("timestamp")
    band_piv = F.lit(_TA_BAND_PIVOT).cast("timestamp")

    hist_a = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("attr_a"),
        base.alias("vf"),
        F.when(F.col("c_custkey") % 5 == 0, seg_piv)
        .otherwise(high)
        .alias("vt"),
    ).unionByName(
        c.filter(F.col("c_custkey") % 5 == 0).select(
            F.col("c_custkey").alias("k"),
            F.lit("PIVOTED").alias("attr_a"),
            seg_piv.alias("vf"),
            high.alias("vt"),
        )
    )
    hist_b = c.select(
        F.col("c_custkey").alias("k"),
        F.lit("OLD").alias("attr_b"),
        base.alias("vf"),
        F.when(F.col("c_custkey") % 3 == 0, band_piv)
        .otherwise(high)
        .alias("vt"),
    ).unionByName(
        c.filter(F.col("c_custkey") % 3 == 0).select(
            F.col("c_custkey").alias("k"),
            F.lit("NEW").alias("attr_b"),
            band_piv.alias("vf"),
            high.alias("vt"),
        )
    )
    bounds = (
        hist_a.select("k", F.col("vf").alias("b"))
        .unionByName(hist_a.select("k", F.col("vt").alias("b")))
        .unionByName(hist_b.select("k", F.col("vf").alias("b")))
        .unionByName(hist_b.select("k", F.col("vt").alias("b")))
        .distinct()
    )
    segs = bounds.select(
        "k",
        F.col("b").alias("seg_from"),
        F.lead("b").over(W.partitionBy("k").orderBy("b")).alias("seg_to"),
    ).filter(F.col("seg_to").isNotNull())
    a = hist_a.select(
        F.col("k").alias("ka"), "attr_a", F.col("vf").alias("avf"),
        F.col("vt").alias("avt"),
    )
    b = hist_b.select(
        F.col("k").alias("kb"), "attr_b", F.col("vf").alias("bvf"),
        F.col("vt").alias("bvt"),
    )
    return (
        segs.join(
            a,
            (F.col("k") == F.col("ka"))
            & (F.col("seg_from") >= F.col("avf"))
            & (F.col("seg_from") < F.col("avt")),
        )
        .join(
            b,
            (F.col("k") == F.col("kb"))
            & (F.col("seg_from") >= F.col("bvf"))
            & (F.col("seg_from") < F.col("bvt")),
        )
        .select(
            F.col("k").alias("c_custkey"),
            "seg_from",
            "seg_to",
            "attr_a",
            "attr_b",
        )
    )
