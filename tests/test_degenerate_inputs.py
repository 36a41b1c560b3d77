"""Degenerate-input sweep: every ts_/events_ statistics operator must
SURVIVE a constant daily series (zero variance, single event type, single
user) — the inputs where ACF denominators, chi-squared margins, entropy
normalizers, funnel denominators, and residual variances are EXACTLY zero.
Under Spark's ANSI mode an unguarded division crashes with DIVIDE_BY_ZERO;
the contract is NULL-propagation (nullif / CASE guards), never a crash.

This sweep found 9 real crashers when first written (ts_autocorr, ts_pacf,
ts_ljung_box, ts_dominant_period, ts_adf_test, ts_cross_correlation,
ts_granger_causality, events_chi2_independence, events_entropy_rate,
events_window_funnel)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from repcheck_data_integration_spark import registry

registry.load_all_modules()

# every registered op whose ONLY input is the events table (the ts_ ops
# that also read orders are exercised on the standard fixtures instead)
SWEEP = [
    "ts_autocorr",
    "ts_pacf",
    "ts_ljung_box",
    "ts_dominant_period",
    "ts_adf_test",
    "ts_cross_correlation",
    "ts_granger_causality",
    "ts_dow_profile",
    "ts_seasonal_strength",
    "ts_gap_fill",
    "ts_decompose_seasonal",
    "ts_anomaly_seasonal",
    "ts_holt_linear",
    "ts_ses_forecast",
    "ts_resample_ohlc",
    "ml_lasso_cd",
    "events_gesd_outliers",
    "events_logrank_test",
    "events_chi2_independence",
    "events_entropy_rate",
    "events_window_funnel",
    "events_type_entropy",
    "events_markov_transitions",
    "events_markov_stationary",
    "events_regularity_score",
    "events_kaplan_meier",
    "events_longest_streak",
    "events_dau_wau_stickiness",
    "events_powerlaw_alpha",
    "events_rate_spike",
    "events_cusum_drift",
    "priv_randomized_response",
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("degen"))
    rows, eid = [], 0
    for d in range(10):
        for _ in range(5):  # constant 5/day, one user, one event type
            rows.append(
                (eid, f"2024-03-{d + 1:02d} 12:00:00", 1, "t", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type", "value", "props"]
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "events.parquet")
    )
    return tmp


@pytest.mark.parametrize("name", SWEEP)
def test_survives_constant_series(spark, degen_dir, name):
    # must not raise — NULL/empty results are the accepted degenerate
    # answer, a crash is not
    registry.QUERIES[name](spark, degen_dir).collect()


ORDERS_SWEEP = [
    "ml_auc_roc",
    "ml_auc_pr",
    "ml_calibration_bins",
    "ml_brier_decomposition",
    "ml_lift_gains",
    "ml_ks_statistic",
    "ml_decision_stump",
    "ml_spearman_corr",
    "ml_kendall_tau",
    "ml_mann_whitney_u",
    "agg_anova_oneway",
    "agg_trimmed_mean",
    "agg_lorenz_deciles",
    "ml_two_proportion_ztest",
    "ml_cmh_test",
    "win_drawdown",
    "agg_gini_revenue",
    "agg_theil_index",
    "ts_theil_sen",
    "ml_linreg_normal_eq",
    "ml_logreg_newton",
    "ml_boosted_stumps",
    "agg_cuped",
    "ts_changepoint_binseg",
    "agg_grouped_linreg",
    "agg_corr_matrix",
    "agg_stats_moments",
    "ml_sprt_ab",
]


@pytest.fixture(scope="module")
def degen_orders_dir(spark, tmp_path_factory):
    """Constant orders/lineitem: one customer, one status, one priority,
    one price — every variance, margin, and determinant is exactly 0."""
    tmp = str(tmp_path_factory.mktemp("degen_orders"))
    o = spark.createDataFrame(
        [(i, 1, "F", 100.0, "P", "1995-06-01") for i in range(10)],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority", "o_d"],
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", F.col("o_d").cast("timestamp").alias("o_orderdate"),
    )
    o.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "orders.parquet")
    )
    li = spark.createDataFrame(
        [(i, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", "1995-06-10")
         for i in range(10)],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus", "l_sd"],
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
        F.col("l_sd").cast("timestamp").alias("l_shipdate"),
    )
    li.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "lineitem.parquet")
    )
    return tmp


@pytest.mark.parametrize("name", ORDERS_SWEEP)
def test_survives_constant_orders(spark, degen_orders_dir, name):
    registry.QUERIES[name](spark, degen_orders_dir).collect()
