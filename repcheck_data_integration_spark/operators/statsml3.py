"""Time-series modeling extensions (round-4 continuation).

Two more forecasting/decomposition operators on the axis opened by
ts_ses_forecast / events_seasonal_naive_mae, each a pure DataFrame plan
with an exact DuckDB oracle twin:

- ts_holt_linear        Holt's linear-trend backtest: exponential
                        smoothing of the level AND of the first
                        differences (the trend), alpha = beta = 1/2 so
                        every weight is a power of two and the h-step
                        forecast level + h*trend is an exact dyadic
                        rational — the model ladder rung above
                        ts_ses_forecast (constant level) that a demand /
                        traffic series with drift actually needs.
- ts_decompose_seasonal Classical additive decomposition (the moving-
                        average method STL descends from): centered
                        7-day moving-average trend, mean-detrended
                        weekday seasonal, remainder — all exact integer
                        numerators over the common denominator 7*n_w.

Reference seed: the reference repo's analytics are single-pass SQL
aggregates (/root/reference/scripts/database/database.py:1); these extend
the §2-beyond inventory along the forecasting axis. House determinism
rules (CLAUDE.md): integer arithmetic until one final division per output
column, identical expression strings on both engines, stable_round4 on
every rational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from .ckpt import pin
from .dedup import sql_stable_round4, stable_round4

# --------------------------------------------------------------------------
# ts_holt_linear
# --------------------------------------------------------------------------

HOLT_WINDOW = 20  # truncated smoothing horizon (alpha = beta = 1/2)

# Series + split CTEs shared with the SES discipline: gap-filled daily
# counts indexed 0..n-1, train = first 80%, k = smoothing horizon. The
# trend needs x_{i-1}, so k is additionally capped at t-1.
_HOLT_SERIES_SQL = f"""
    daily AS (
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, count(*) AS c
        FROM events GROUP BY 1),
    bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
    grid AS (
        SELECT unnest(generate_series(
                   0, CAST(date_diff('day', d0, d1) AS INT))) AS idx
        FROM bounds),
    di AS (
        SELECT CAST(date_diff('day', b.d0, daily.d) AS INT) AS idx, daily.c
        FROM daily CROSS JOIN bounds b),
    series AS (
        SELECT g.idx, COALESCE(di.c, 0) AS x,
               COALESCE(di.c, 0)
                 - lag(COALESCE(di.c, 0)) OVER (ORDER BY g.idx) AS dx
        FROM grid g LEFT JOIN di ON di.idx = g.idx),
    sp AS (
        SELECT count(*) AS nn,
               CAST(count(*) * 8 // 10 AS INT) AS t,
               least({HOLT_WINDOW},
                     CAST(count(*) * 8 // 10 AS INT) - 1) AS k
        FROM series)
"""


@register(
    "ts_holt_linear",
    oracle=f"""
    WITH {_HOLT_SERIES_SQL},
    lvl AS (
        SELECT sum(CASE WHEN s.idx = sp.t - sp.k THEN s.x
                        ELSE s.x * (CAST(1 AS BIGINT)
                                    << (s.idx - (sp.t - sp.k) - 1))
                   END) AS lnum,
               sum(CASE WHEN s.idx = sp.t - sp.k THEN s.dx
                        ELSE s.dx * (CAST(1 AS BIGINT)
                                     << (s.idx - (sp.t - sp.k) - 1))
                   END) AS tnum,
               (CAST(1 AS BIGINT) << (sp.k - 1)) AS den,
               max(CASE WHEN s.idx = sp.t - 1 THEN s.x END) AS last_x
        FROM series s CROSS JOIN sp
        WHERE s.idx >= sp.t - sp.k AND s.idx < sp.t
        GROUP BY sp.k),
    test AS (
        SELECT count(*) AS n_test,
               sum(abs(s.x * lvl.den
                       - (lvl.lnum + (s.idx - sp.t + 1) * lvl.tnum)))
                   AS err_holt_num,
               sum(abs(s.x * lvl.den - lvl.lnum)) AS err_ses_num,
               sum(abs(s.x - lvl.last_x)) AS err_naive
        FROM series s CROSS JOIN sp CROSS JOIN lvl
        WHERE s.idx >= sp.t)
    SELECT CAST(sp.t AS BIGINT) AS n_train,
           CAST(test.n_test AS BIGINT) AS n_test,
           {sql_stable_round4(
               'CAST(lvl.lnum AS DOUBLE) / CAST(lvl.den AS DOUBLE)')}
               AS holt_level,
           {sql_stable_round4(
               'CAST(lvl.tnum AS DOUBLE) / CAST(lvl.den AS DOUBLE)')}
               AS holt_trend,
           {sql_stable_round4(
               'CAST(test.err_holt_num AS DOUBLE)'
               ' / (CAST(lvl.den AS DOUBLE) * CAST(test.n_test AS DOUBLE))')}
               AS mae_holt,
           {sql_stable_round4(
               'CAST(test.err_ses_num AS DOUBLE)'
               ' / (CAST(lvl.den AS DOUBLE) * CAST(test.n_test AS DOUBLE))')}
               AS mae_ses,
           {sql_stable_round4(
               'CAST(test.err_naive AS DOUBLE) / CAST(test.n_test AS DOUBLE)')}
               AS mae_naive
    FROM sp CROSS JOIN lvl CROSS JOIN test
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend backtest (Holt 1957) on the daily event series:
    smooth the LEVEL over the last {HOLT_WINDOW} train days AND the TREND
    as the same smoothing applied to the first differences, then forecast
    ŷ(t+h) = level + h·trend over the 20% holdout. Reports MAE against
    the Holt forecast, the trendless SES level (is the trend term worth
    carrying?) and the naive last-value baseline — the model-selection
    triple a traffic/demand series with drift needs; ts_ses_forecast is
    the h-independent special case trend = 0.

    alpha = beta = 1/2 keeps EVERYTHING exact (the ts_ses_forecast
    discipline): both smoothers' weights are powers of two, so
    level·2^(k-1) and trend·2^(k-1) are exact BIGINT weighted sums
    (shiftleft / <<), the h-step forecast numerator lnum + h·tnum is an
    exact integer, and every holdout error is the cross-multiplied
    integer |x·2^(k-1) − (lnum + h·tnum)|. One double division per
    output column at the very end, through stable_round4. The trend
    smoother is SES over Δx — the truncated-horizon identity for Holt's
    recursion with matched decay, chosen so BOTH engines can express the
    same finite weighted sum.

    Scale shape: the fact scan collapses to |days| rows in one hash
    aggregate; the lag, the two k-term weighted sums and the holdout MAE
    all operate on the calendar-bounded series (a single-partition window
    over ~100 rows, explicitly NOT a data-sized window), independent of
    fact bytes.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.count("*").alias("c"))
        # |days|-row frame read by bounds, the grid join and the series:
        # without the cache each consumer re-scans the fact table
        .persist()
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = bounds.select(
        F.explode(
            F.sequence(F.lit(0), F.datediff(F.col("d1"), F.col("d0")))
        ).alias("idx")
    )
    di = daily.crossJoin(F.broadcast(bounds)).select(
        F.datediff(F.col("d"), F.col("d0")).cast("int").alias("idx"), "c"
    )
    # calendar-bounded series: the global-order lag window runs on ~100
    # rows post-aggregation, never on fact data
    series = (
        grid.join(di, "idx", "left")
        .select("idx", F.coalesce("c", F.lit(0)).alias("x"))
        .withColumn("dx", F.col("x") - F.lag("x").over(W.orderBy("idx")))
    )
    sp = series.agg(
        F.count("*").alias("nn"),
        F.expr("CAST(count(*) * 8 DIV 10 AS INT)").alias("t"),
        F.least(
            F.lit(HOLT_WINDOW),
            F.expr("CAST(count(*) * 8 DIV 10 AS INT) - 1"),
        ).alias("k"),
    )
    wexpr = (
        "CASE WHEN idx = t - k THEN {v} ELSE {v} *"
        " shiftleft(CAST(1 AS BIGINT), idx - (t - k) - 1) END"
    )
    lvl = (
        series.crossJoin(F.broadcast(sp))
        .filter(
            (F.col("idx") >= F.col("t") - F.col("k"))
            & (F.col("idx") < F.col("t"))
        )
        .groupBy("k")
        .agg(
            F.sum(F.expr(wexpr.format(v="x"))).alias("lnum"),
            F.sum(F.expr(wexpr.format(v="dx"))).alias("tnum"),
            F.max(
                F.when(F.col("idx") == F.col("t") - 1, F.col("x"))
            ).alias("last_x"),
        )
        .withColumn("den", F.expr("shiftleft(CAST(1 AS BIGINT), k - 1)"))
    )
    test = (
        series.crossJoin(F.broadcast(sp))
        .crossJoin(F.broadcast(lvl))
        .filter(F.col("idx") >= F.col("t"))
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.abs(
                    F.col("x") * F.col("den")
                    - (
                        F.col("lnum")
                        + (F.col("idx") - F.col("t") + 1) * F.col("tnum")
                    )
                )
            ).alias("err_holt_num"),
            F.sum(
                F.abs(F.col("x") * F.col("den") - F.col("lnum"))
            ).alias("err_ses_num"),
            F.sum(F.abs(F.col("x") - F.col("last_x"))).alias("err_naive"),
        )
    )
    return (
        sp.crossJoin(F.broadcast(lvl))
        .crossJoin(F.broadcast(test))
        .select(
            F.col("t").cast("long").alias("n_train"),
            F.col("n_test").cast("long"),
            stable_round4(
                F.col("lnum").cast("double") / F.col("den").cast("double")
            ).alias("holt_level"),
            stable_round4(
                F.col("tnum").cast("double") / F.col("den").cast("double")
            ).alias("holt_trend"),
            stable_round4(
                F.col("err_holt_num").cast("double")
                / (F.col("den").cast("double") * F.col("n_test").cast("double"))
            ).alias("mae_holt"),
            stable_round4(
                F.col("err_ses_num").cast("double")
                / (F.col("den").cast("double") * F.col("n_test").cast("double"))
            ).alias("mae_ses"),
            stable_round4(
                F.col("err_naive").cast("double")
                / F.col("n_test").cast("double")
            ).alias("mae_naive"),
        )
    )


# --------------------------------------------------------------------------
# ts_decompose_seasonal
# --------------------------------------------------------------------------

MA_HALF = 3  # centered 7-day moving average: +/- 3 days


@register(
    "ts_decompose_seasonal",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, count(*) AS c
        FROM events GROUP BY 1),
    bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
    grid AS (
        SELECT unnest(generate_series(
                   0, CAST(date_diff('day', d0, d1) AS INT))) AS idx
        FROM bounds),
    di AS (
        SELECT CAST(date_diff('day', b.d0, daily.d) AS INT) AS idx, daily.c
        FROM daily CROSS JOIN bounds b),
    series AS (
        SELECT g.idx, COALESCE(di.c, 0) AS x
        FROM grid g LEFT JOIN di ON di.idx = g.idx),
    ma AS (
        SELECT idx, x, idx % 7 AS wd,
               CASE WHEN count(*) OVER win = 7
                    THEN sum(x) OVER win END AS s7
        FROM series
        WINDOW win AS (ORDER BY idx
                       ROWS BETWEEN {MA_HALF} PRECEDING
                                AND {MA_HALF} FOLLOWING)),
    seas AS (
        SELECT wd, sum(7 * x - s7) AS snum, count(*) AS nw
        FROM ma WHERE s7 IS NOT NULL GROUP BY wd)
    SELECT ma.idx AS idx,
           CAST(ma.wd AS INTEGER) AS weekday,
           CAST(ma.x AS BIGINT) AS x,
           {sql_stable_round4('CAST(ma.s7 AS DOUBLE) / 7.0')} AS trend,
           {sql_stable_round4(
               'CAST(seas.snum AS DOUBLE) / (7.0 * CAST(seas.nw AS DOUBLE))')}
               AS seasonal,
           {sql_stable_round4(
               'CAST((7 * ma.x - ma.s7) * seas.nw - seas.snum AS DOUBLE)'
               ' / (7.0 * CAST(seas.nw AS DOUBLE))')} AS remainder
    FROM ma LEFT JOIN seas ON seas.wd = ma.wd AND ma.s7 IS NOT NULL
    ORDER BY idx
    """,
)
def ts_decompose_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (the centered-moving-
    average method of Macaulay 1931 — the procedure STL refines) of the
    daily event series: trend = centered 7-day moving average (full
    windows only), seasonal = per-weekday mean of the detrended series,
    remainder = what neither explains. x = trend + seasonal + remainder
    holds EXACTLY on every interior row — the anomaly-detection and
    deseasonalization primitive under events_rate_spike / seasonal-naive
    forecasting.

    Exactness: trend is the rational s7/7 (s7 an exact integer window
    sum); the detrended value is (7x − s7)/7, so the weekday seasonal
    mean is Σ(7x − s7) / (7·n_w) and the remainder is the single
    division ((7x − s7)·n_w − snum) / (7·n_w) — every numerator an
    exact BIGINT, one IEEE division per output column, stable_round4 on
    top. The weekday key is idx % 7 (engine-neutral), NOT dayofweek()
    (Spark and DuckDB disagree on week origin). Edge rows without a full
    7-day window emit NULL trend/seasonal/remainder rather than a padded
    estimate — honest, and exactly mirrored in the twin via the
    count(*) OVER = 7 guard.

    Scale shape: the fact scan collapses to |days| rows in one hash
    aggregate; the moving-average window, the 7-row seasonal aggregate
    and the join-back all run on the calendar-bounded series
    (single-partition window over ~100 rows by construction, never over
    fact data).
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.count("*").alias("c"))
        # |days|-row frame read by bounds, the grid join and the series:
        # without the cache each consumer re-scans the fact table
        .persist()
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = bounds.select(
        F.explode(
            F.sequence(F.lit(0), F.datediff(F.col("d1"), F.col("d0")))
        ).alias("idx")
    )
    di = daily.crossJoin(F.broadcast(bounds)).select(
        F.datediff(F.col("d"), F.col("d0")).cast("int").alias("idx"), "c"
    )
    series = grid.join(di, "idx", "left").select(
        "idx", F.coalesce("c", F.lit(0)).alias("x")
    )
    win = W.orderBy("idx").rowsBetween(-MA_HALF, MA_HALF)
    ma = series.select(
        "idx",
        "x",
        (F.col("idx") % 7).alias("wd"),
        F.when(
            F.count("*").over(win) == 7, F.sum("x").over(win)
        ).alias("s7"),
    )
    seas = (
        ma.filter(F.col("s7").isNotNull())
        .groupBy("wd")
        .agg(
            F.sum(7 * F.col("x") - F.col("s7")).alias("snum"),
            F.count("*").alias("nw"),
        )
    )
    return (
        ma.join(F.broadcast(seas), "wd", "left")
        .select(
            "idx",
            F.col("wd").cast("int").alias("weekday"),
            F.col("x").cast("long").alias("x"),
            stable_round4(F.col("s7").cast("double") / F.lit(7.0)).alias(
                "trend"
            ),
            stable_round4(
                F.when(
                    F.col("s7").isNotNull(),
                    F.col("snum").cast("double")
                    / (F.lit(7.0) * F.col("nw").cast("double")),
                )
            ).alias("seasonal"),
            stable_round4(
                (
                    (7 * F.col("x") - F.col("s7")) * F.col("nw")
                    - F.col("snum")
                ).cast("double")
                / (F.lit(7.0) * F.col("nw").cast("double"))
            ).alias("remainder"),
        )
        .orderBy("idx")
    )


# --------------------------------------------------------------------------
# ts_anomaly_seasonal — STL-residual anomaly days
# --------------------------------------------------------------------------

ANOM_K = 3  # flag when |remainder - median| > K * MAD


def _anomaly_oracle() -> str:
    from ..registry import ORACLE

    return f"""
    WITH dec AS ({ORACLE["ts_decompose_seasonal"]}),
    interior AS (SELECT * FROM dec WHERE remainder IS NOT NULL),
    m AS (SELECT median(remainder) AS med FROM interior),
    d AS (SELECT i.*, abs(i.remainder - m.med) AS dev
          FROM interior i CROSS JOIN m),
    s AS (SELECT median(dev) AS mad FROM d)
    SELECT d.idx, d.weekday, d.x, d.remainder,
           CAST(CASE WHEN d.dev > {ANOM_K} * s.mad
                     THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
    FROM d CROSS JOIN s
    ORDER BY d.idx
    """


@register("ts_anomaly_seasonal", oracle=_anomaly_oracle())
def ts_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-aware anomaly days: flag days whose DECOMPOSITION
    REMAINDER sits more than {ANOM_K}·MAD from the median remainder —
    the robust residual test run on ts_decompose_seasonal's output (the
    registered op is reused directly, so the decomposition and the
    anomaly screen cannot drift). This is the seasonality-adjusted member
    of the anomaly family: events_rate_spike trips on raw volume (every
    weekend), dq_outliers_mad on the global distribution (misses a level
    shift), win_hampel_filter on per-point windows; the residual screen
    only fires when a day deviates from BOTH its trend and its weekday
    pattern.

    Determinism: remainders are stable_round4 outputs (exact 4-decimal
    doubles, identical in both engines); the two medians interpolate the
    average of middle elements — an exact IEEE half of 4-decimal values,
    computed identically by Spark's percentile() and DuckDB's median();
    deviations, the MAD and the {ANOM_K}·MAD compare are then exact
    double arithmetic on those values.

    Scale shape: the decomposition collapses to |days| rows; both median
    aggregates and the flag projection run on that calendar-bounded
    series. Nothing here ever exceeds |days| rows past the first
    aggregate.
    """
    dec = ts_decompose_seasonal(spark, sf_dir)
    interior = dec.filter(F.col("remainder").isNotNull())
    m = interior.agg(F.expr("percentile(remainder, 0.5)").alias("med"))
    d = interior.crossJoin(F.broadcast(m)).select(
        "idx",
        "weekday",
        "x",
        "remainder",
        F.abs(F.col("remainder") - F.col("med")).alias("dev"),
    )
    s = d.agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    return (
        d.crossJoin(F.broadcast(s))
        .select(
            "idx",
            "weekday",
            "x",
            "remainder",
            (F.col("dev") > ANOM_K * F.col("mad"))
            .cast("int")
            .alias("is_anomaly"),
        )
        .orderBy("idx")
    )


# --------------------------------------------------------------------------
# events_entropy_rate — Markov conditional entropy of the event stream
# --------------------------------------------------------------------------

ER_SCALE = 1_000_000


@register(
    "events_entropy_rate",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
    tr AS (SELECT prev_type, event_type AS next_type FROM seq
           WHERE prev_type IS NOT NULL),
    pc AS (SELECT prev_type, next_type, count(*) AS n
           FROM tr GROUP BY 1, 2),
    sc AS (SELECT prev_type, sum(n) AS ns,
                  CAST(floor(sum(n) * ln(sum(n)) * {ER_SCALE}) AS BIGINT)
                      AS q1,
                  sum(CAST(floor(n * ln(n) * {ER_SCALE}) AS BIGINT)) AS q2,
                  count(*) AS n_pairs
           FROM pc GROUP BY prev_type),
    t AS (SELECT sum(ns) AS big_n, count(*) AS n_states,
                 sum(n_pairs) AS n_pairs,
                 sum(q1) AS q1, sum(q2) AS q2
          FROM sc)
    SELECT CAST(big_n AS BIGINT) AS n_transitions,
           CAST(n_states AS BIGINT) AS n_states,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           floor(((q1 - q2) * 1.0 / {ER_SCALE} / big_n / ln(2))
                 * 10000.0 + 0.5) / 10000.0 AS entropy_rate_bits,
           floor((ln(n_states) / ln(2)) * 10000.0 + 0.5) / 10000.0
               AS max_bits,
           floor((1.0 - ((q1 - q2) * 1.0 / {ER_SCALE} / big_n)
                        / nullif(ln(n_states), 0.0))
                 * 10000.0 + 0.5) / 10000.0
               AS predictability
    FROM t
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the event stream as a first-order Markov
    chain: H(next | prev) = (Σ_s n_s·ln n_s − Σ_st n_st·ln n_st) / N in
    nats, reported in bits with the predictability index 1 − H/ln|S| —
    the single-number summary of events_markov_transitions (how
    predictable is user behavior overall?), used to decide whether a
    sequence model is worth training on the stream at all (Song et al.,
    Science 2010 popularized the same limit for mobility traces).

    Determinism: the events_type_entropy discipline on the transition
    alphabet — every float term is floor(c·ln c·1e6) quantized to an
    integer per (prev,next) or per prev BEFORE summation, so shuffles
    cannot reorder float adds; ln of identical integers is bit-identical
    across engines; three final IEEE divisions through stable_round4
    form.

    Scale shape: one user-keyed shuffle for the lag, one hash aggregate
    to the |S|² alphabet, then |S|-row and 1-row rollups — output is a
    single row regardless of input size.
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    pc = tr.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    qint = lambda c: F.floor(  # noqa: E731
        c * F.log(c) * F.lit(ER_SCALE)
    ).cast("long")
    sc = pc.groupBy("prev_type").agg(
        F.sum("n").alias("ns"),
        F.sum(qint(F.col("n"))).alias("q2"),
        F.count(F.lit(1)).alias("n_pairs"),
    ).select(
        "prev_type", "ns", qint(F.col("ns")).alias("q1"), "q2", "n_pairs"
    )
    t = sc.agg(
        F.sum("ns").alias("big_n"),
        F.count(F.lit(1)).alias("n_states"),
        F.sum("n_pairs").alias("n_pairs"),
        F.sum("q1").alias("q1"),
        F.sum("q2").alias("q2"),
    )
    h_nats = (
        (F.col("q1") - F.col("q2"))
        * 1.0
        / F.lit(ER_SCALE)
        / F.col("big_n")
    )
    r4 = lambda c: F.floor(c * 10000.0 + 0.5) / 10000.0  # noqa: E731
    return t.select(
        F.col("big_n").cast("long").alias("n_transitions"),
        F.col("n_states").cast("long").alias("n_states"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        r4(h_nats / F.log(F.lit(2.0))).alias("entropy_rate_bits"),
        r4(F.log(F.col("n_states").cast("double")) / F.log(F.lit(2.0))).alias(
            "max_bits"
        ),
        r4(
            F.lit(1.0)
            - h_nats
            / F.expr("nullif(ln(CAST(n_states AS DOUBLE)), 0.0)")
        ).alias("predictability"),
    )


# --------------------------------------------------------------------------
# ml_sprt_ab — Wald sequential probability ratio test per experiment arm
# --------------------------------------------------------------------------

# H0: p = 0.45 vs H1: p = 0.55, alpha = beta = 0.05. The four log terms
# are pre-quantized to integer millionths HERE (plain Python floor(ln·1e6))
# and inlined as literals into BOTH engines, so neither engine ever
# evaluates a logarithm — the whole test is integer arithmetic.
SPRT_POS = 200_670      # floor(ln(0.55/0.45) * 1e6)  per success
SPRT_NEG = -200_671     # floor(ln(0.45/0.55) * 1e6)  per failure
SPRT_UPPER = 2_944_438  # floor(ln((1-beta)/alpha) * 1e6) → accept H1
SPRT_LOWER = -2_944_439  # floor(ln(beta/(1-alpha)) * 1e6) → accept H0
SPRT_BUCKET = 4096      # arrival-order scan bucket width (prefix-sum scan)


@register(
    "ml_sprt_ab",
    oracle=f"""
    WITH obs AS (
        SELECT o_custkey % 2 AS arm, o_orderkey,
               CASE WHEN o_orderstatus = 'F'
                    THEN {SPRT_POS} ELSE {SPRT_NEG} END AS step
        FROM orders),
    cum AS (
        SELECT arm, o_orderkey,
               sum(step) OVER (PARTITION BY arm ORDER BY o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS llr,
               row_number() OVER (PARTITION BY arm
                                  ORDER BY o_orderkey) AS rn
        FROM obs),
    crossed AS (
        SELECT arm, rn, llr FROM cum
        WHERE llr >= {SPRT_UPPER} OR llr <= {SPRT_LOWER}),
    firstx AS (
        SELECT arm, min(rn) AS n_at_decision,
               arg_min(llr, rn) AS llr_at_decision
        FROM crossed GROUP BY arm),
    tot AS (SELECT arm, count(*) AS n_obs FROM obs GROUP BY arm)
    SELECT t.arm AS arm,
           CAST(t.n_obs AS BIGINT) AS n_obs,
           CAST(f.n_at_decision AS BIGINT) AS n_at_decision,
           CAST(f.llr_at_decision AS BIGINT) AS llr_at_decision_q,
           CASE WHEN f.llr_at_decision >= {SPRT_UPPER} THEN 'accept_h1'
                WHEN f.llr_at_decision <= {SPRT_LOWER} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM tot t LEFT JOIN firstx f ON f.arm = t.arm
    ORDER BY arm
    """,
)
def ml_sprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test (Wald 1945) per experiment
    arm: replay each arm's Bernoulli outcome stream (order finality, arms
    split by customer-key parity) in arrival order, accumulate the
    log-likelihood ratio, and report WHEN the test first crosses a
    decision boundary and which hypothesis it accepts — the sequential
    (early-stopping) counterpart of agg_ab_ttest's fixed-horizon test;
    this is how an experimentation platform stops an A/B test the moment
    evidence suffices instead of at a preplanned N.

    Determinism: all four log constants are pre-quantized integers
    inlined into BOTH engines (no runtime ln anywhere), so the cumulative
    LLR is an exact integer prefix sum and boundary crossings are integer
    compares; the first crossing index is unique by construction.

    Scale shape: the global per-arm running sum is the textbook
    non-distributable window, computed here as the two-level parallel
    prefix SCAN (the events_late_data_audit pattern, with + instead of
    max): per-(arm, bucket) sums via one hash aggregate, an exclusive
    prefix over the |buckets|-sized table (the only single-partition
    window, bounded by buckets), broadcast back, and a within-bucket
    running sum over bounded {SPRT_BUCKET}-row partitions. One shuffle on
    the bucket key; output is two rows.
    """
    o = load(spark, sf_dir, "orders")
    obs = o.select(
        (F.col("o_custkey") % 2).alias("arm"),
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", SPRT_POS)
        .otherwise(SPRT_NEG)
        .alias("step"),
        F.expr(f"o_orderkey div {SPRT_BUCKET}").alias("b"),
    )
    bagg = obs.groupBy("arm", "b").agg(
        F.sum("step").alias("bsum"), F.count(F.lit(1)).alias("bcnt")
    )
    wpre = W.partitionBy("arm").orderBy("b").rowsBetween(
        W.unboundedPreceding, -1
    )
    bpre = bagg.select(
        "arm",
        "b",
        F.coalesce(F.sum("bsum").over(wpre), F.lit(0)).alias("pre_sum"),
        F.coalesce(F.sum("bcnt").over(wpre), F.lit(0)).alias("pre_cnt"),
    )
    win = (
        W.partitionBy("arm", "b")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = (
        obs.join(F.broadcast(bpre), ["arm", "b"])
        .select(
            "arm",
            (F.col("pre_sum") + F.sum("step").over(win)).alias("llr"),
            (F.col("pre_cnt") + F.count(F.lit(1)).over(
                W.partitionBy("arm", "b")
                .orderBy("o_orderkey")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )).alias("rn"),
        )
    )
    firstx = (
        cum.filter(
            (F.col("llr") >= SPRT_UPPER) | (F.col("llr") <= SPRT_LOWER)
        )
        .groupBy("arm")
        .agg(
            F.min("rn").alias("n_at_decision"),
            F.min_by("llr", "rn").alias("llr_at_decision"),
        )
    )
    tot = obs.groupBy("arm").agg(F.count(F.lit(1)).alias("n_obs"))
    return (
        tot.join(F.broadcast(firstx), "arm", "left")
        .select(
            "arm",
            F.col("n_obs").cast("long"),
            F.col("n_at_decision").cast("long"),
            F.col("llr_at_decision").cast("long").alias(
                "llr_at_decision_q"
            ),
            F.when(F.col("llr_at_decision") >= SPRT_UPPER, "accept_h1")
            .when(F.col("llr_at_decision") <= SPRT_LOWER, "accept_h0")
            .otherwise("continue")
            .alias("decision"),
        )
        .orderBy("arm")
    )


# --------------------------------------------------------------------------
# events_markov_stationary — fixed-point power iteration to pi
# --------------------------------------------------------------------------

MS_SCALE = 1_000_000


@register(
    "events_markov_stationary",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
    tr AS (SELECT prev_type, event_type AS next_type FROM seq
           WHERE prev_type IS NOT NULL),
    pc AS (SELECT prev_type, next_type, count(*) AS n
           FROM tr GROUP BY 1, 2),
    rs AS (SELECT prev_type, sum(n) AS ns FROM pc GROUP BY prev_type),
    states AS (SELECT prev_type AS s FROM rs),
    ns AS (SELECT count(*) AS k FROM states),
    p0 AS (SELECT s AS node, CAST({MS_SCALE} AS BIGINT) // k AS r
           FROM states CROSS JOIN ns),
    p1 AS (
        SELECT pc.next_type AS node,
               sum((p0.r * pc.n) // rs.ns) AS r
        FROM pc JOIN rs ON rs.prev_type = pc.prev_type
                JOIN p0 ON p0.node = pc.prev_type
        GROUP BY 1),
    p2 AS (
        SELECT pc.next_type AS node,
               sum((p1.r * pc.n) // rs.ns) AS r
        FROM pc JOIN rs ON rs.prev_type = pc.prev_type
                JOIN p1 ON p1.node = pc.prev_type
        GROUP BY 1),
    emp AS (
        SELECT next_type AS node, sum(n) AS cnt FROM pc GROUP BY 1),
    tot AS (SELECT sum(cnt) AS t FROM emp)
    SELECT p2.node AS state,
           CAST(p2.r AS BIGINT) AS stationary_q,
           CAST((emp.cnt * {MS_SCALE}) // tot.t AS BIGINT)
               AS empirical_q
    FROM p2 JOIN emp ON emp.node = p2.node CROSS JOIN tot
    ORDER BY state
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: two exact
    fixed-point power iterations π' = πP from the uniform start over the
    transition matrix of events_markov_transitions, next to each state's
    EMPIRICAL share — how far the chain's long-run behavior sits from
    today's observed mix (the load-forecasting question: if users keep
    behaving like this, what does steady-state traffic look like?).
    Completes the Markov family: transitions (the matrix), entropy rate
    (its information content), stationary (its fixed point).

    Determinism: the graph_pagerank/graph_hits integer discipline —
    probabilities in millionths, every update term the floor-divided
    integer (π(s)·n_st) div n_s·, summed exactly; the oracle unrolls the
    same two iterations as CTEs.

    Scale shape: one user-keyed lag shuffle collapses the stream to the
    |S|² alphabet; both iterations are joins over that tiny matrix —
    cost is alphabet-, not event-, sized after the first aggregate.
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.select(
            "user_id", "ts", "event_id",
            F.col("event_type").alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    pc = tr.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    ).persist()  # both iterations + the row sums + empirical read it
    rs = pc.groupBy("prev_type").agg(F.sum("n").alias("ns"))
    k = rs.count()  # |S| — singleton driver scalar (house-allowed)
    ranks = rs.select(
        F.col("prev_type").alias("node"),
        F.lit(MS_SCALE // k).cast("long").alias("r"),
    )
    for _ in range(2):
        ranks = (
            pc.join(rs, "prev_type")
            .join(
                F.broadcast(ranks.select(F.col("node").alias("prev_type"), "r")),
                "prev_type",
            )
            .groupBy(F.col("next_type").alias("node"))
            .agg(F.sum(F.expr("(r * n) div ns")).alias("r"))
            .transform(pin)
        )
    emp = pc.groupBy(F.col("next_type").alias("node")).agg(
        F.sum("n").alias("cnt")
    )
    tot = emp.agg(F.sum("cnt").alias("t"))
    return (
        ranks.join(emp, "node")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("node").alias("state"),
            F.col("r").cast("long").alias("stationary_q"),
            # DECIMAL before the multiply (round-10 overflow sweep):
            # cnt*1e6 wraps LONG at ~9.2e12 transitions of one type —
            # posture-adjacent for the events fact; the quotient is a
            # millionth-share <= 1e6 so the DIV result always fits.
            F.expr(f"(CAST(cnt AS DECIMAL(19,0)) * {MS_SCALE}) div t")
            .cast("long")
            .alias("empirical_q"),
        )
        .orderBy("state")
    )
