"""Behavioral tests for the round-4b eval/robust-stats/recsys/privacy
tranche (operators/statsml2.py) on tiny hand-built parquet fixtures —
known-answer properties the DuckDB oracle twin can't state (perfect/
random-ranker recovery, separability, planted trends, mechanism
reproducibility)."""

from __future__ import annotations

import hashlib
import math
import os

from pyspark.sql import functions as F

from repcheck_data_integration_spark.operators.statsml2 import (
    agg_theil_index,
    ml_calibration_bins,
    ml_ks_statistic,
    ml_lift_gains,
    ts_ses_forecast,
    DP_EPSILON,
    REC_MIN_CO,
    ml_auc_roc,
    ml_decision_stump,
    priv_dp_counts,
    rec_item_item_cosine,
    ts_cross_correlation,
    ts_theil_sen,
)


def _write(spark, tmp_path, name, rows, cols):
    spark.createDataFrame(rows, cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), f"{name}.parquet"))


def _orders(spark, tmp_path, rows):
    """rows: (priority, status, totalprice)."""
    _write(
        spark,
        tmp_path,
        "orders",
        [(i, i, st, p, pri) for i, (pri, st, p) in enumerate(rows)],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    )


def test_auc_perfect_random_and_pooled(spark, tmp_path):
    """Segment A: every positive outranks every negative -> AUC 1.0.
    Segment B: all scores tied -> AUC exactly 0.5 (tie correction).
    The pooled row must equal the python rank-sum ground truth."""
    rows = (
        [("A", "F", 100.0 + i) for i in range(5)]
        + [("A", "O", 1.0 + i) for i in range(5)]
        + [("B", "F", 50.0)] * 3
        + [("B", "O", 50.0)] * 3
    )
    _orders(spark, tmp_path, rows)
    out = {r["segment"]: r for r in ml_auc_roc(spark, str(tmp_path)).collect()}
    assert out["A"]["auc"] == 1.0
    assert out["B"]["auc"] == 0.5
    assert (out["A"]["n_pos"], out["A"]["n_neg"]) == (5, 5)

    # pooled ground truth: P(pos > neg) + 0.5 * P(tie), exhaustive pairs
    pos = [p for _, s, p in rows if s == "F"]
    neg = [p for _, s, p in rows if s != "F"]
    wins = sum(1 for a in pos for b in neg if a > b)
    ties = sum(1 for a in pos for b in neg if a == b)
    want = math.floor(
        (wins + 0.5 * ties) / (len(pos) * len(neg)) * 10000 + 0.5
    ) / 10000
    assert out["__all__"]["auc"] == want


def test_stump_finds_planted_separating_threshold(spark, tmp_path):
    """Label == (quantity <= 5): the quantity stump at threshold 5 must
    have 0 errors and accuracy 1; the discount feature (constant within
    each class but overlapping) cannot reach 0."""
    rows = []
    k = 0
    for q in range(1, 11):
        for _ in range(4):
            flag = "R" if q <= 5 else "N"
            disc = 0.01 if k % 2 == 0 else 0.05  # uninformative
            rows.append((k, k, k, 1, float(q), 10.0, disc, 0.0, flag, "O"))
            k += 1
    _write(
        spark, tmp_path, "lineitem", rows,
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus"],
    )
    out = ml_decision_stump(spark, str(tmp_path)).collect()
    byfeat = {}
    for r in out:
        byfeat.setdefault(r["feature"], []).append(r)
    best_q = byfeat["l_quantity"][0]
    assert best_q["rk"] == 1
    assert best_q["threshold"] == 5
    assert best_q["errors"] == 0
    assert best_q["accuracy"] == 1.0
    assert best_q["n_left"] == 20 and best_q["n_right"] == 20
    assert best_q["baseline_errors"] == 20
    assert all(r["errors"] > 0 for r in byfeat["l_discount_pct"])


def test_theil_sen_recovers_planted_linear_trend(spark, tmp_path):
    """Weekly order counts c_w = 3 + 2w exactly -> every pairwise slope
    is 2, so median slope 2.0 and median residual intercept 3.0."""
    rows = []
    k = 0
    for w in range(8):
        for i in range(3 + 2 * w):
            # spread inside the week so the day->week floor matters
            day = w * 7 + (i % 7)
            rows.append((k, k, "O", 10.0, f"2024-01-{1:02d}", day))
            k += 1
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[5]) for r in rows],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "doff"],
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,doff,0,0,0)")
        .alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    row = ts_theil_sen(spark, str(tmp_path)).collect()[0]
    assert row["n_weeks"] == 8
    assert row["n_pairs"] == 8 * 7 // 2
    assert row["slope"] == 2.0
    assert row["intercept"] == 3.0


def test_cross_correlation_finds_planted_lead(spark, tmp_path):
    """clicks spike on day 3, purchases spike on day 5 over a flat
    baseline -> the CCF must peak exactly at lag +2 (clicks lead)."""
    rows = []
    eid = 0
    for d in range(14):
        n_click = 20 if d == 3 else 2
        n_buy = 20 if d == 5 else 2
        for _ in range(n_click):
            rows.append((eid, f"2024-03-{d + 1:02d} 10:00:00", 1, "click"))
            eid += 1
        for _ in range(n_buy):
            rows.append((eid, f"2024-03-{d + 1:02d} 11:00:00", 1, "purchase"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type"]
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    out = {r["lag"]: r for r in
           ts_cross_correlation(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(-7, 8))
    peak = max(out.values(), key=lambda r: r["ccf"])
    assert peak["lag"] == 2
    assert peak["ccf"] > 0.9
    assert out[2]["n_overlap"] == 14 - 2


def test_item_item_cosine_known_baskets(spark, tmp_path):
    """Baskets {A,B} x2 and {A,C} x2: c_AB=2 and c_AC=2 survive the
    support floor, cosines match the closed form, and each item's
    neighbor list is ranked by cosine."""
    assert REC_MIN_CO == 2
    baskets = [(1, ["A", "B"]), (2, ["A", "B"]), (3, ["A", "C"]),
               (4, ["A", "C"]), (5, ["B"])]
    pk = {"A": 100, "B": 200, "C": 300}
    rows = []
    ln = 0
    for ok, items in baskets:
        for it in items:
            rows.append((ok, pk[it], 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O"))
            ln += 1
    _write(
        spark, tmp_path, "lineitem", rows,
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus"],
    )
    out = rec_item_item_cosine(spark, str(tmp_path)).collect()
    got = {(r["part"], r["neighbor"]): r for r in out}
    # c_A=4, c_B=3, c_C=2; cos(A,B)=2/sqrt(12), cos(A,C)=2/sqrt(8)
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000
    assert got[(100, 200)]["cosine"] == r4(2 / math.sqrt(12))
    assert got[(100, 300)]["cosine"] == r4(2 / math.sqrt(8))
    assert got[(200, 100)]["co_count"] == 2
    # A's top neighbor is C (higher cosine), rank order enforced
    assert got[(100, 300)]["rk"] == 1 and got[(100, 200)]["rk"] == 2


def test_dp_counts_reproducible_inverse_cdf(spark, tmp_path):
    """The released value must equal the python replica of the salted
    inverse-CDF Laplace draw exactly — reproducibility is the point of
    the deterministic mechanism — and distinct groups get distinct
    noise."""
    rows = []
    eid = 0
    for et, n in [("alpha", 40), ("beta", 25)]:
        for _ in range(n):
            rows.append((eid, "2024-01-01 00:00:00", 1, et, 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type", "value", "props"]
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    out = {r["event_type"]: r for r in
           priv_dp_counts(spark, str(tmp_path)).collect()}

    def replica(et, c):
        h = int(hashlib.md5(f"{et}|dp1".encode()).hexdigest()[:12], 16)
        u = h / float(16**12) - 0.5
        arg = max(1.0 - 2.0 * abs(u), 1e-12)
        noise = (
            (-1.0 if u >= 0 else 1.0)
            * (1.0 / DP_EPSILON)
            * math.floor(math.log(arg) * 1e6 + 0.5)
            / 1e6
        )
        return math.floor((c + noise) * 10000 + 0.5) / 10000

    assert out["alpha"]["noisy_count"] == replica("alpha", 40)
    assert out["beta"]["noisy_count"] == replica("beta", 25)
    assert out["alpha"]["true_count"] == 40
    assert (out["alpha"]["noisy_count"] - 40) != (
        out["beta"]["noisy_count"] - 25
    )


def test_lift_gains_perfect_ranker_front_loads(spark, tmp_path):
    """40 rows, top decile = all 4 positives: gain hits 1.0 at decile 1
    and lift_1 = n/P = 10; deciles are exact 4-row cuts."""
    rows = [("A", "F", 1000.0 - i) for i in range(4)] + [
        ("A", "O", 500.0 - i) for i in range(36)
    ]
    _orders(spark, tmp_path, rows)
    out = {r["decile"]: r for r in ml_lift_gains(spark, str(tmp_path)).collect()}
    assert len(out) == 10
    assert all(r["n_bucket"] == 4 for r in out.values())
    assert out[1]["n_pos"] == 4
    assert out[1]["gain"] == 1.0
    assert out[1]["lift"] == 10.0
    assert out[10]["gain"] == 1.0
    assert out[10]["lift"] == 1.0


def test_ks_statistic_disjoint_distributions(spark, tmp_path):
    """Fully separated scores -> KS = 1.0 exactly at the top negative
    score; equal distributions -> KS = 0."""
    rows = [("A", "F", 100.0 + i) for i in range(5)] + [
        ("A", "O", 10.0 + i) for i in range(5)
    ]
    _orders(spark, tmp_path, rows)
    row = ml_ks_statistic(spark, str(tmp_path)).collect()[0]
    assert row["ks"] == 1.0
    assert row["ks_at_cents"] == int((10.0 + 4) * 100)

    rows2 = [("A", "F", 50.0), ("A", "O", 50.0)] * 5
    _orders(spark, tmp_path, rows2)
    row2 = ml_ks_statistic(spark, str(tmp_path)).collect()[0]
    assert row2["ks"] == 0.0


def test_calibration_percentile_identity(spark, tmp_path):
    """Labels assigned by score percentile (top half positive) make the
    rank calibration nearly perfect in the extreme bins: accuracy is 0
    in the bottom bins and 1 in the top bins, and ECE equals the python
    replica of the integer formula."""
    n = 100
    rows = [("A", "F" if i >= n // 2 else "O", 100.0 + i) for i in range(n)]
    _orders(spark, tmp_path, rows)
    out = ml_calibration_bins(spark, str(tmp_path)).collect()
    byb = {r["bin"]: r for r in out}
    assert byb[0]["accuracy"] == 0.0 and byb[9]["accuracy"] == 1.0
    # python replica: unique scores, rank = i+1, bin = i*10 // (n-1)
    import collections
    agg = collections.defaultdict(lambda: [0, 0, 0])  # n_b, pos_b, srk
    for i in range(n):
        bb = min((i * 10) // (n - 1), 9)
        agg[bb][0] += 1
        agg[bb][1] += 1 if i >= n // 2 else 0
        agg[bb][2] += i
    ece_num = sum(abs(srk - pos * (n - 1)) for (_, pos, srk) in agg.values())
    want = math.floor(ece_num / ((n - 1) * n) * 10000 + 0.5) / 10000
    assert out[0]["ece"] == want
    for r in out:
        nb, pos, srk = agg[r["bin"]]
        assert r["n_bin"] == nb
        assert r["confidence"] == math.floor(
            srk / ((n - 1) * nb) * 10000 + 0.5
        ) / 10000


def test_ses_forecast_constant_series_zero_error(spark, tmp_path):
    """A constant daily series: SES level == the constant, both MAEs 0;
    a step in the holdout is tracked by neither (equal MAEs)."""
    rows = []
    eid = 0
    for d in range(30):
        for _ in range(7):
            rows.append((eid, f"2024-03-{d + 1:02d} 09:00:00", 1, "t"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type"]
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    row = ts_ses_forecast(spark, str(tmp_path)).collect()[0]
    assert row["n_train"] == 24 and row["n_test"] == 6
    assert row["ses_level"] == 7.0
    assert row["mae_ses"] == 0.0 and row["mae_naive"] == 0.0


def test_theil_zero_for_equal_and_positive_for_skew(spark, tmp_path):
    """Equal per-customer revenue -> T = 0 (each term ln(1)); moving all
    revenue to one customer pushes T toward ln(n)."""
    rows = [(i, i % 4, "O", 100.0, "1-URGENT") for i in range(8)]
    _write(
        spark, tmp_path, "orders",
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    )
    row = agg_theil_index(spark, str(tmp_path)).collect()[0]
    assert row["n_customers"] == 4
    assert row["theil_t"] == 0.0

    rows2 = [(0, 0, "O", 1000.0, "x")] + [
        (i, i, "O", 0.01, "x") for i in range(1, 4)
    ]
    _write(
        spark, tmp_path, "orders",
        [(r[0], r[1], r[2], r[3], "1-URGENT") for r in rows2],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    )
    row2 = agg_theil_index(spark, str(tmp_path)).collect()[0]
    assert 1.0 < row2["theil_t"] < math.log(4) + 0.01


def test_bootstrap_ci_brackets_mean_and_reproduces(spark, tmp_path):
    """The 95% Poisson-bootstrap CI must bracket the exact mean for a
    well-behaved sample, and the deterministic mechanism must reproduce
    identical intervals across runs."""
    rows = [("A", "O", 100.0 + (i % 11)) for i in range(200)]
    _orders(spark, tmp_path, rows)
    from repcheck_data_integration_spark.operators.statsml2 import (
        agg_bootstrap_ci,
    )
    r1 = agg_bootstrap_ci(spark, str(tmp_path)).collect()[0]
    assert r1["n_rows"] == 200
    assert r1["ci_lo"] <= r1["mean_cents"] <= r1["ci_hi"]
    assert r1["ci_lo"] < r1["ci_hi"]
    r2 = agg_bootstrap_ci(spark, str(tmp_path)).collect()[0]
    assert (r1["ci_lo"], r1["ci_hi"]) == (r2["ci_lo"], r2["ci_hi"])


def test_window_funnel_enforces_step_deadline(spark, tmp_path):
    """User 1 converts view->click->purchase inside 48h windows; user 2
    clicks 3 days after viewing (excluded); user 3 purchases 3 days
    after clicking (counted at click, not purchase)."""
    from repcheck_data_integration_spark.streaming.batch_windows import (
        events_window_funnel,
    )
    rows = [
        (1, "2024-03-01 00:00:00", 1, "view"),
        (2, "2024-03-01 10:00:00", 1, "click"),
        (3, "2024-03-02 10:00:00", 1, "purchase"),
        (4, "2024-03-01 00:00:00", 2, "view"),
        (5, "2024-03-04 00:00:00", 2, "click"),
        (6, "2024-03-04 01:00:00", 2, "purchase"),
        (7, "2024-03-01 00:00:00", 3, "view"),
        (8, "2024-03-01 01:00:00", 3, "click"),
        (9, "2024-03-05 00:00:00", 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type"]
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    r = events_window_funnel(spark, str(tmp_path)).collect()[0]
    assert r["n_view"] == 3
    assert r["n_click_48h"] == 2       # users 1 and 3
    assert r["n_purchase_48h"] == 1    # user 1 only
    assert r["conv_click"] == math.floor(2 / 3 * 10000 + 0.5) / 10000
    assert r["conv_purchase"] == 0.5
    assert r["avg_hours_to_convert"] == 34.0  # user 1: 34h view->purchase


# ---------------------------------------------------------------------------
# _median_center_avg — the round-9 bucketed exact median selection
# ---------------------------------------------------------------------------


def _ref_center_avg(values):
    """Reference: mean of the rows with 1-based rank in
    [(m+1)//2, m//2+1] of the sorted multiset — one value for odd m, the
    two central values for even m."""
    s = sorted(values)
    m = len(s)
    lo, hi = (m + 1) // 2, m // 2 + 1
    mid = s[lo - 1 : hi]
    return sum(mid) / len(mid)


def test_median_center_avg_matches_reference_shapes(spark):
    """Odd/even counts, duplicates, negatives, values clustered so the
    target ranks straddle a bucket boundary, and the all-equal degenerate
    (single-bucket) case — each against the sorted-list reference."""
    from repcheck_data_integration_spark.operators.statsml2 import (
        _median_center_avg,
    )

    cases = [
        [5.0],                                   # singleton
        [2.0, 4.0],                              # even: mean of both
        [1.0, 2.0, 3.0],                         # odd
        [1.0, 1.0, 1.0, 1.0],                    # all equal (width 0)
        [-3.0, -1.0, 0.0, 2.0, 7.0, 7.0],        # even, negatives, ties
        [float(i) for i in range(1, 1001)],      # even, many buckets
        [float(i) for i in range(1, 1002)],      # odd, many buckets
        # heavy clustering: most mass in one bucket, median inside it
        [0.0] * 400 + [1e-9] * 300 + [1e6, 2e6],
        # ranks straddle two adjacent buckets: 500 small + 500 large,
        # centers are the max small and min large
        [float(i) for i in range(500)] + [1e5 + i for i in range(500)],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        got = _median_center_avg(df, "v").collect()[0]["avg"]
        assert got == _ref_center_avg(vals), vals[:5]


def test_median_center_avg_tie_order_irrelevant(spark):
    """The selected central VALUES depend only on the value multiset —
    permuting rows / tie columns never changes the result (the property
    that lets the selection skip a global tie-broken row_number)."""
    from repcheck_data_integration_spark.operators.statsml2 import (
        _median_center_avg,
    )

    vals = [3.0, 1.0, 3.0, 2.0, 3.0, 1.0]  # even m, ties at the center
    a = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], ["v", "t"]
    )
    b = spark.createDataFrame(
        [(v, 99 - i) for i, v in enumerate(reversed(vals))], ["v", "t"]
    )
    ra = _median_center_avg(a, "v", "t").collect()[0]["avg"]
    rb = _median_center_avg(b, "v", "t").collect()[0]["avg"]
    assert ra == rb == _ref_center_avg(vals)


def test_median_center_avg_hypothesis_random_multisets(spark):
    """Randomized multisets (drawn once, deterministic seed) including
    integer-valued doubles and duplicates, odd and even sizes."""
    import random

    from repcheck_data_integration_spark.operators.statsml2 import (
        _median_center_avg,
    )

    rng = random.Random(2609)
    for trial in range(6):
        m = rng.randrange(1, 60)
        vals = [
            float(rng.choice([rng.randrange(-50, 50), rng.uniform(-5, 5)]))
            for _ in range(m)
        ]
        df = spark.createDataFrame([(v,) for v in vals], ["v"]).repartition(4)
        got = _median_center_avg(df, "v").collect()[0]["avg"]
        assert got == _ref_center_avg(vals), (trial, m)


def test_median_center_avg_degenerate_width_guard(spark):
    """ADVICE r9: widths that are 0.0 by subnormal underflow or non-finite
    (±inf endpoints → inf span; Spark's NaN compares GREATER than 0, so a
    bare `width > 0` test would pass NaN through) must route every row to
    bucket 0 — the single-window degradation — instead of wrapping the
    int cast negative and scrambling rank offsets."""
    from repcheck_data_integration_spark.operators.statsml2 import (
        _median_center_avg,
    )

    inf = float("inf")
    cases = [
        # inf span: (_mx - _mn) overflows to +inf → width inf
        ([-1.7e308, 1.7e308, 1.0, 2.0, 3.0], 2.0),
        # explicit ±inf endpoints, finite median
        ([-inf, 0.0, inf], 0.0),
        # NaN width: all values +inf → _mx - _mn = inf - inf = NaN
        ([inf, inf, inf], inf),
        # subnormal underflow: span/256 flushes to exactly 0.0
        ([5e-324, 1e-323, 1.5e-323], 1e-323),
        # even m across an inf span: mean of the two central values
        ([-1.7e308, -1.0, 1.0, 1.7e308], 0.0),
    ]
    for vals, want in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = _median_center_avg(df, "v").collect()[0]["avg"]
        assert got == want, (vals, got, want)


# ---------------------------------------------------------------------------
# ts_theil_sen span cap + sampled estimator (round-10, VERDICT r9 #4)
# ---------------------------------------------------------------------------


def _write_orders_weeks(spark, tmp, week_counts):
    """orders.parquet whose weekly count series is exactly week_counts
    (one date per week, 7-day spacing)."""
    import datetime
    import os

    base = datetime.date(2020, 1, 6)
    rows, k = [], 0
    for w, c in week_counts:
        for _ in range(c):
            rows.append((k, base + datetime.timedelta(days=7 * w)))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date"
    ).coalesce(2).write.mode("overwrite").parquet(
        os.path.join(tmp, "orders.parquet")
    )


def test_theil_sen_span_cap_fails_fast(spark, tmp_path):
    """Exact all-pairs Theil-Sen is O(span²) by algorithm: past
    TS_SEN_MAX_WEEKS the woven assert_true must fail the query instead
    of launching a multi-billion-pair join — and the sampled estimator
    must handle the same span (O(span·K) draws)."""
    import pytest

    from repcheck_data_integration_spark.operators.statsml2 import (
        TS_SEN_MAX_WEEKS,
        ts_theil_sen,
        ts_theil_sen_sampled,
    )

    tmp = str(tmp_path)
    _write_orders_weeks(spark, tmp, [(0, 3), (TS_SEN_MAX_WEEKS + 100, 2)])
    with pytest.raises(Exception, match="capped at"):
        ts_theil_sen(spark, tmp).collect()
    row = ts_theil_sen_sampled(spark, tmp).collect()[0]
    assert row["n_weeks"] == TS_SEN_MAX_WEEKS + 101
    assert row["slope"] is not None


def test_theil_sen_sampled_recovers_trend_with_outliers(spark, tmp_path):
    """Estimator quality: on a slope-2 linear weekly series with three
    corrupted weeks (+500 orders), both the exact median and the sampled
    median must recover slope 2 — the sample keeps ≥K pairs per week, so
    3/100 outlier weeks stay a minority of sampled slopes."""
    from repcheck_data_integration_spark.operators.statsml2 import (
        ts_theil_sen,
        ts_theil_sen_sampled,
    )

    tmp = str(tmp_path)
    counts = [
        (w, 50 + 2 * w + (500 if w in (10, 40, 70) else 0))
        for w in range(100)
    ]
    _write_orders_weeks(spark, tmp, counts)
    e = ts_theil_sen(spark, tmp).collect()[0]
    s = ts_theil_sen_sampled(spark, tmp).collect()[0]
    assert e["slope"] == 2.0
    assert abs(s["slope"] - 2.0) <= 0.05, s["slope"]
    assert 0 < s["n_pairs_sampled"] < e["n_pairs"]
