"""Calibration / selection / fusion extensions (round-5 continuation).

Families the 100 TB experimentation-and-curation story still
lacked, each a pure DataFrame plan with an exact DuckDB oracle twin:

- ml_isotonic_calibration  PAV isotonic regression over the reliability
                         bins via the minimax identity
                         iso(i) = max_{j<=i} min_{k>=i} ybar(j..k) —
                         the monotone recalibration map fitted
                         relationally (no sequential pooling loop), on
                         the same rank-score base as ml_calibration_bins.
- priv_noisy_max         report-noisy-max eps-DP selection: discrete
                         Laplace as the difference of two integer-
                         threshold geometric inverse-CDF draws.
- events_attribution_shapley  EXACT Shapley channel credit over all 16
                         coalitions; factorial weights as per-mask
                         integer literals, phi carried x24 as BIGINT.
- ml_conformal_interval  split-conformal prediction intervals: rank-
                         picked calibration residual, distribution-free
                         coverage certified empirically.
- llm_hybrid_rrf         reciprocal-rank fusion of the registered BM25
                         leg and a quantized-cosine dense leg — exact
                         integer floor(1e12/(k+rank)) scores.

Reference seed: the reference repo's analytics are single-pass SQL
aggregates (/root/reference/scripts/database/database.py:1); these extend
the §2-beyond inventory along the calibration/selection axis. House
determinism rules (CLAUDE.md): integer arithmetic until one final
division per output column, identical expression strings interpolated
into BOTH engines, stable_round4 on every rational, md5-buckets as the
cross-engine rand() substitute. sqrt is IEEE correctly-rounded so
sqrt-of-exact-double is safe (the agg_corr_matrix precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..tables import literal_frame, load
from .ckpt import pin
from .dedup import sql_stable_round4
from .sampling import hash_bucket, sql_hash_bucket

# --------------------------------------------------------------------------
# ml_isotonic_calibration — PAV via the minimax identity over the bins
# --------------------------------------------------------------------------

ISO_BINS = 10
# segment averages quantized to 1e-12 BEFORE the minimax lattice walk so
# max/min compare integers, never engine-ordered doubles
ISO_SCALE = 1_000_000_000_000


@register(
    "ml_isotonic_calibration",
    oracle=f"""
    WITH base AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders),
    r AS (
        SELECT pos, rank() OVER (ORDER BY cents) AS rk,
               count(*) OVER () AS n
        FROM base),
    b AS (
        SELECT least(CAST((rk - 1) * {ISO_BINS} // (n - 1) AS INT),
                     {ISO_BINS - 1}) AS bin, pos
        FROM r),
    g AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(pos) AS BIGINT) AS pos_b
        FROM b GROUP BY 1),
    segs AS (
        SELECT j.bin AS jb, k.bin AS kb,
               (sum(m.pos_b) * {ISO_SCALE}) // sum(m.n_b) AS aq
        FROM g j JOIN g k ON j.bin <= k.bin
        JOIN g m ON m.bin BETWEEN j.bin AND k.bin
        GROUP BY 1, 2),
    inner_min AS (
        SELECT i.bin, s.jb, min(s.aq) AS mn
        FROM g i JOIN segs s ON s.jb <= i.bin AND s.kb >= i.bin
        GROUP BY 1, 2),
    iso AS (
        SELECT bin, max(mn) AS iso_q FROM inner_min GROUP BY 1)
    SELECT g.bin, g.n_b AS n_bin, g.pos_b AS pos_bin,
           {sql_stable_round4(
               'CAST(g.pos_b AS DOUBLE) / CAST(g.n_b AS DOUBLE)')}
               AS raw_rate,
           {sql_stable_round4(
               f'CAST(iso.iso_q AS DOUBLE) / {ISO_SCALE}.0')}
               AS iso_rate
    FROM g JOIN iso ON g.bin = iso.bin
    ORDER BY g.bin
    """,
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) recalibration of the rank-score reliability curve,
    fitted relationally via the minimax identity iso(i) = max_{{j<=i}}
    min_{{k>=i}} ybar(j..k) — the closed form of pool-adjacent-violators
    (Robertson, Wright & Dykstra 1988), so no sequential pooling loop
    exists in the plan. Same rank-cut base as ml_calibration_bins; the
    output iso_rate is monotone non-decreasing in bin by construction
    (the property a downstream score consumer relies on).

    Determinism: bin stats are exact integer counts; every segment
    average over bins j..k is quantized to an integer at 1e-12 by exact
    integer division BEFORE the minimax max/min walk, so the lattice
    compares integers, never engine-ordered doubles; final rates are one
    double division each through stable_round4.

    Scale shape (round-8 departition): the bin cut comes from
    prefix_offsets over the distinct score values (no global fact rank
    — the old window was the 3.0x row in SCALE.md's 10x probe, hidden
    from the plan audit by a sibling op's persist); everything past the
    {ISO_BINS}-row bin aggregate is lattice algebra on O(bins^2) =
    {ISO_BINS * ISO_BINS} rows.
    """
    o = load(spark, sf_dir, "orders")
    base = o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    # round-8 departition (rank-cut family, same machinery as
    # ml_calibration_bins): rank() ties share, so the bin of every row
    # in a cents group is determined by off_cnt(cents) alone — compute
    # it with prefix_offsets over the DISTINCT values instead of a
    # global fact rank through one task.
    from .prefix import prefix_offsets

    vg = base.groupBy("cents").agg(
        F.count("*").alias("cnt"), F.sum("pos").alias("pos_c")
    )
    offs = prefix_offsets(vg, "cents", ["cnt"], ascending=True)
    b = offs.select(
        F.least(
            F.expr(f"CAST(off_cnt * {ISO_BINS} DIV (tot_cnt - 1) AS INT)"),
            F.lit(ISO_BINS - 1),
        ).alias("bin"),
        "cnt",
        "pos_c",
    )
    g = b.groupBy("bin").agg(
        F.sum("cnt").alias("n_b"), F.sum("pos_c").alias("pos_b")
    ).transform(pin)
    # ^ the minimax lattice references g FIVE times (j/k/m legs, the
    # inner-min probe, the final join) — unpinned, each leg re-ran the
    # entire prefix DAG; pinned, the lattice reads 10 cached rows
    j = g.select(F.col("bin").alias("jb"))
    k = g.select(F.col("bin").alias("kb"))
    m = g.select(
        F.col("bin").alias("mb"), F.col("n_b").alias("mn_b"),
        F.col("pos_b").alias("mpos_b"),
    )
    segs = (
        j.join(k, F.col("jb") <= F.col("kb"))
        .join(m, (F.col("mb") >= F.col("jb")) & (F.col("mb") <= F.col("kb")))
        .groupBy("jb", "kb")
        .agg(
            # DECIMAL before the multiply (round-10 overflow sweep):
            # sum(pos)*1e12 wraps LONG at just ~9.2e6 positives per
            # segment (sf100-adjacent); the quotient is a fraction at
            # 1e12 so the DIV result always fits. DuckDB's twin is
            # already exact (its sum() returns HUGEINT).
            F.expr(
                f"(CAST(sum(mpos_b) AS DECIMAL(19,0)) * {ISO_SCALE})"
                " div sum(mn_b)"
            ).alias("aq")
        )
    )
    inner_min = (
        g.select(F.col("bin"))
        .join(
            segs,
            (F.col("jb") <= F.col("bin")) & (F.col("kb") >= F.col("bin")),
        )
        .groupBy("bin", "jb")
        .agg(F.min("aq").alias("mn"))
    )
    iso = inner_min.groupBy("bin").agg(F.max("mn").alias("iso_q"))
    out = g.join(iso, "bin")
    return out.selectExpr(
        "bin",
        "n_b AS n_bin",
        "pos_b AS pos_bin",
        f"CAST({sql_stable_round4('CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE)')}"
        " AS DOUBLE) AS raw_rate",
        f"CAST({sql_stable_round4(f'CAST(iso_q AS DOUBLE) / {ISO_SCALE}.0')}"
        " AS DOUBLE) AS iso_rate",
    ).orderBy("bin")


# --------------------------------------------------------------------------
# priv_noisy_max — eps-DP selection via report-noisy-max (discrete Laplace)
# --------------------------------------------------------------------------

# Geometric(1 - e^-1) inverse CDF as integer thresholds on a uniform
# md5-bucket in [0, 1e6): floor((1 - e^-(k+1)) * 1e6), k = 0..8, tail -> 9.
# The DIFFERENCE of two iid geometric draws is the discrete Laplace with
# scale 1/eps, eps = 1 (Inusah & Kozubowski 2006) — count sensitivity is 1
# per user-event, so argmax(count + noise) is eps-DP selection.
_NM_T = [632120, 864664, 950212, 981684, 993262, 997521, 999088, 999664,
         999876]
def _nm_geo(u: str) -> str:
    return (
        "CASE "
        + " ".join(f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_NM_T))
        + " ELSE 9 END"
    )


@register(
    "priv_noisy_max",
    oracle=f"""
    WITH counts AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1),
    draws AS (
        SELECT event_type, n,
               {sql_hash_bucket("'nm1-' || event_type", 1000000)} AS u1,
               {sql_hash_bucket("'nm2-' || event_type", 1000000)} AS u2
        FROM counts),
    noisy AS (
        SELECT event_type, n,
               n + ({_nm_geo('u1')}) - ({_nm_geo('u2')}) AS noisy_n
        FROM draws),
    mx AS (SELECT max(noisy_n) AS m FROM noisy)
    SELECT event_type, noisy_n,
           CASE WHEN noisy_n = m THEN 1 ELSE 0 END AS is_selected
    FROM noisy CROSS JOIN mx
    ORDER BY noisy_n DESC, event_type
    """,
)
def priv_noisy_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report-noisy-max eps-DP selection (eps = 1) of the most frequent
    event type: each candidate's count gets independent discrete-Laplace
    noise — the difference of two Geometric(1 - e^-1) draws (Inusah &
    Kozubowski 2006) — and the released answer is the argmax plus the
    noisy counts themselves (also DP by post-processing). Completes the
    privacy kit's SELECTION corner: priv_dp_counts releases noisy
    aggregates, priv_randomized_response is the device-local mechanism,
    this is the DP argmax a pipeline uses to pick a category to publish.

    Determinism: both geometric draws are integer-threshold inverse CDFs
    (literal thresholds floor((1-e^-(k+1))*1e6)) on salted md5-buckets of
    the candidate name — replayable, engine-exact, no float anywhere;
    true counts never leave the plan (only noisy_n and the argmax flag
    are projected out).

    Scale shape: one map-side-combinable count over the fact table; the
    mechanism itself runs on the |candidates|-row aggregate, and the max
    is a broadcast 1-row scalar.
    """
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count("*").alias("n"))
    draws = counts.select(
        "event_type",
        "n",
        hash_bucket(
            F.concat(F.lit("nm1-"), F.col("event_type")), 1000000
        ).alias("u1"),
        hash_bucket(
            F.concat(F.lit("nm2-"), F.col("event_type")), 1000000
        ).alias("u2"),
    )
    noisy = draws.selectExpr(
        "event_type",
        f"n + ({_nm_geo('u1')}) - ({_nm_geo('u2')}) AS noisy_n",
    )
    mx = noisy.agg(F.max("noisy_n").alias("m"))
    return (
        noisy.crossJoin(F.broadcast(mx))
        .selectExpr(
            "event_type",
            "noisy_n",
            "CASE WHEN noisy_n = m THEN 1 ELSE 0 END AS is_selected",
        )
        .orderBy(F.col("noisy_n").desc(), "event_type")
    )


# --------------------------------------------------------------------------
# events_attribution_shapley — exact Shapley-value channel attribution
# --------------------------------------------------------------------------

# channels and their coalition bits (purchase is the CONVERSION, not a
# channel); n = 4, so Shapley runs EXACTLY over the 16 coalitions
SHAP_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
SHAP_N = 4
# |S|! * (n-1-|S|)! for every coalition mask S with channel i absent —
# precomputed per MASK as integer literals so neither engine needs a
# popcount/factorial at runtime; sum of weights over S = n!/n = 6
_SHAP_W = {0: 6, 1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 6: 2, 7: 6,
           8: 2, 9: 2, 10: 2, 11: 6, 12: 2, 13: 6, 14: 6}
def _shap_w_case(col: str) -> str:
    return (
        f"CASE {col} "
        + " ".join(f"WHEN {m} THEN {w}" for m, w in sorted(_SHAP_W.items()))
        + " END"
    )
_SHAP_MASK = " + ".join(
    f"max(CASE WHEN event_type = '{c}' THEN {b} ELSE 0 END)"
    for c, b in SHAP_CHANNELS
)
_SHAP_CH_CASE = (
    "CASE bit "
    + " ".join(f"WHEN {b} THEN '{c}'" for c, b in SHAP_CHANNELS)
    + " END"
)


@register(
    "events_attribution_shapley",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               {_SHAP_MASK} AS t_mask,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id),
    observed AS (
        SELECT t_mask, CAST(sum(conv) AS BIGINT) AS conv_cnt
        FROM per_user GROUP BY 1),
    smasks AS (SELECT unnest(generate_series(0, 15)) AS s_mask),
    v AS (
        SELECT s_mask,
               CAST(coalesce(sum(CASE WHEN (t_mask & s_mask) = t_mask
                                      THEN conv_cnt END), 0) AS BIGINT)
                   AS v_s
        FROM smasks LEFT JOIN observed ON true
        GROUP BY 1),
    chans AS (SELECT unnest([1, 2, 4, 8]) AS bit),
    terms AS (
        SELECT c.bit,
               ({_shap_w_case("vo.s_mask")})
                   * (vw.v_s - vo.v_s) AS term
        FROM chans c
        JOIN v vo ON (vo.s_mask & c.bit) = 0
        JOIN v vw ON vw.s_mask = (vo.s_mask | c.bit)),
    phi AS (
        SELECT bit, CAST(sum(term) AS BIGINT) AS phi_x24
        FROM terms GROUP BY 1),
    tot AS (SELECT sum(phi_x24) AS t24 FROM phi)
    SELECT {_SHAP_CH_CASE} AS channel,
           phi_x24,
           floor(phi_x24 / 24.0 * 10000.0 + 0.5) / 10000.0 AS phi,
           floor(CAST(phi_x24 AS DOUBLE) / nullif(t24, 0) * 10000.0
                 + 0.5) / 10000.0 AS share
    FROM phi CROSS JOIN tot
    ORDER BY channel
    """,
)
def events_attribution_shapley(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT Shapley-value channel attribution (Shapley 1953; the
    data-driven attribution model behind ad platforms — completes the
    family next to events_attribution_last_touch / _linear): each user
    contributes their touched-channel set (a 4-bit mask over
    click/error/signup/view) and a conversion bit (purchased); the
    coalition value v(S) = conversions of users whose touch set is
    CONTAINED in S; channel i's credit is the Shapley average marginal
    phi_i = sum_S |S|!(n-1-|S|)!/n! * (v(S+i) - v(S)). With n=4 the sum
    runs exactly over all 16 coalitions — no sampling, no permutation
    Monte Carlo. Efficiency holds by construction: sum phi = v(all) -
    v(empty), certified by the share column.

    Determinism: masks and conversion counts are exact integers; the
    factorial weights are PRECOMPUTED integer literals per coalition
    mask (no runtime popcount/factorial); phi is kept x24 (= n!) as a
    BIGINT and descaled once through the stable-round4 form.

    Scale shape: one user-keyed conditional aggregate over events (the
    only pass over the fact table), collapsing to <= 16 observed-mask
    rows; everything after — the subset-sum closure, the 4 x 8 marginal
    grid, the rollup — is constant-size lattice algebra on broadcast
    frames, independent of input volume.
    """
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.expr(_SHAP_MASK).alias("t_mask"),
        F.expr(
            "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        ).alias("conv"),
    )
    observed = per_user.groupBy("t_mask").agg(
        F.sum("conv").alias("conv_cnt")
    )
    smasks = spark.range(16).select(F.col("id").cast("int").alias("s_mask"))
    v = (
        smasks.join(F.broadcast(observed), F.lit(True), "left")
        .groupBy("s_mask")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.expr("(t_mask & s_mask) = t_mask"),
                        F.col("conv_cnt"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("v_s")
        )
        # the 16-row lattice frame is reused by both marginal sides and
        # the rollup: localCheckpoint it so events is scanned ONCE (the
        # label-frame discipline from graph.py — without it every reuse
        # recomputes the full lineage). Eager pin, matching the pre-r9
        # bare .localCheckpoint() (ADVICE r9: the r9 reroute through
        # lazy_pin silently moved the events scan from build time into
        # the first action — a behavior change, not a pure refactor)
        .transform(pin)
    )
    chans = literal_frame(
        spark, [(b,) for _, b in SHAP_CHANNELS], "bit int"
    )
    vo = v.select(F.col("s_mask"), F.col("v_s").alias("v_without"))
    vw = v.select(
        F.col("s_mask").alias("w_mask"), F.col("v_s").alias("v_with")
    )
    terms = (
        chans.join(F.broadcast(vo), F.expr("(s_mask & bit) = 0"))
        .join(F.broadcast(vw), F.expr("w_mask = (s_mask | bit)"))
        .selectExpr(
            "bit",
            f"({_shap_w_case('s_mask')}) * (v_with - v_without)"
            " AS term",
        )
    )
    phi = terms.groupBy("bit").agg(
        F.sum("term").cast("long").alias("phi_x24")
    )
    return (
        phi.withColumn(
            "t24", F.sum("phi_x24").over(W.partitionBy())
        )
        .selectExpr(
            f"{_SHAP_CH_CASE} AS channel",
            "phi_x24",
            "CAST(floor(CAST(phi_x24 AS DOUBLE) / 24.0 * 10000.0 + 0.5)"
            " / 10000.0 AS DOUBLE) AS phi",
            "CAST(floor(CAST(phi_x24 AS DOUBLE) / nullif(t24, 0)"
            " * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS share",
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# ml_conformal_interval — split-conformal prediction intervals per group
# --------------------------------------------------------------------------

CONF_ALPHA_PCT = 10  # 90% marginal coverage


@register(
    "ml_conformal_interval",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority AS grp,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
               {sql_hash_bucket("'conf-' || CAST(o_orderkey AS VARCHAR)",
                                2)} AS fold
        FROM orders),
    mu AS (
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n_train,
               CAST((sum(CAST(cents AS HUGEINT)) * 1000000) // count(*)
                    AS BIGINT) AS mean_micro
        FROM base WHERE fold = 0 GROUP BY 1),
    calib AS (
        SELECT b.grp, b.o_orderkey,
               abs(b.cents * 1000000 - m.mean_micro) AS resid_micro
        FROM base b JOIN mu m ON b.grp = m.grp
        WHERE b.fold = 1),
    ranked AS (
        SELECT grp, resid_micro,
               row_number() OVER (PARTITION BY grp
                                  ORDER BY resid_micro, o_orderkey) AS rk,
               count(*) OVER (PARTITION BY grp) AS n_cal
        FROM calib),
    qhat AS (
        SELECT grp, n_cal, resid_micro AS q_micro
        FROM ranked
        WHERE rk = least(
            CAST(ceil((n_cal + 1) * (100 - {CONF_ALPHA_PCT}) / 100.0)
                 AS BIGINT), n_cal)),
    cov AS (
        SELECT c.grp,
               CAST(sum(CASE WHEN c.resid_micro <= q.q_micro
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_in
        FROM calib c JOIN qhat q ON c.grp = q.grp
        GROUP BY 1)
    SELECT m.grp AS priority,
           m.n_train, q.n_cal,
           floor(m.mean_micro / 100000000.0 * 10000.0 + 0.5) / 10000.0
               AS center,
           floor(q.q_micro / 100000000.0 * 10000.0 + 0.5) / 10000.0
               AS half_width,
           floor(c.n_in * 1.0 / q.n_cal * 10000.0 + 0.5) / 10000.0
               AS calib_coverage
    FROM mu m JOIN qhat q ON m.grp = q.grp JOIN cov c ON c.grp = m.grp
    ORDER BY priority
    """,
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals per order priority (Vovk et
    al. 2005; Lei et al. 2018 — the distribution-free uncertainty wrap
    modern ML serving puts around ANY point predictor): a deterministic
    md5 fold split, the fold-0 group mean as the predictor, fold-1
    absolute residuals as conformity scores, and the interval half-width
    is the ceil((n+1)(1-alpha))-th smallest calibration residual — rank
    selection, no distributional assumption. 90% marginal coverage is
    GUARANTEED by exchangeability; the calib_coverage column certifies
    it empirically on the calibration fold (>= 0.9 by construction of
    the rank pick).

    Determinism: fold assignment is a salted md5-bucket; the group mean
    is an exact integer division to micro-cents; residuals stay integer
    micro-cents; the oracle's quantile is a row_number pick with an
    orderkey tie-break, and the Spark side selects the SAME value from
    the distinct-residual offsets (ties share a value, so the rank-k
    value never depends on tie order); outputs descale once through the
    stable-round4 form.

    Scale shape (round-10 partitioned-window sweep): the old form
    ranked every calibration row inside 5 priority partitions — a
    fact-scaled single-task sort per priority, invisible to the
    unpartitioned-window audit, with row_number's IntegerType counter
    wrapping past 2^31 rows per priority. Now: a map-side-combining
    aggregate to distinct (grp, resid) counts, grouped_prefix_offsets
    (every window partitioned by (grp, value bucket)), and the rank-k
    pick is the value group with off < k <= off + c. Integer rank
    bounds via DIV/ceil kept textually identical to the oracle.
    """
    from .grouped_prefix import grouped_prefix_offsets
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
        hash_bucket(
            F.concat(F.lit("conf-"), F.col("o_orderkey").cast("string")), 2
        ).alias("fold"),
    )
    mu = (
        base.filter(F.col("fold") == 0)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_train"),
            F.expr(
                "CAST((sum(CAST(cents AS DECIMAL(38,0))) * 1000000)"
                " div count(*) AS BIGINT)"
            ).alias("mean_micro"),
        )
    )
    calib = (
        base.filter(F.col("fold") == 1)
        .join(F.broadcast(mu.select("grp", "mean_micro")), "grp")
        .select(
            "grp",
            "o_orderkey",
            F.abs(
                F.col("cents") * 1000000 - F.col("mean_micro")
            ).alias("resid_micro"),
        )
    )
    vg = calib.groupBy("grp", "resid_micro").agg(
        F.count(F.lit(1)).alias("c")
    )
    offs = grouped_prefix_offsets(vg, ["grp"], "resid_micro", ["c"])
    qhat = (
        offs.withColumn(
            "rk_t",
            F.expr(
                f"least(CAST(ceil((tot_c + 1)"
                f" * (100 - {CONF_ALPHA_PCT}) / 100.0) AS BIGINT), tot_c)"
            ),
        )
        .filter(
            (F.col("off_c") < F.col("rk_t"))
            & ((F.col("off_c") + F.col("c")) >= F.col("rk_t"))
        )
        .select(
            "grp",
            F.col("tot_c").alias("n_cal"),
            F.col("resid_micro").alias("q_micro"),
        )
    )
    cov = (
        calib.join(F.broadcast(qhat.select("grp", "q_micro")), "grp")
        .groupBy("grp")
        .agg(
            F.sum(
                F.when(F.col("resid_micro") <= F.col("q_micro"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_in")
        )
    )
    out = mu.join(qhat, "grp").join(cov, "grp")
    return out.selectExpr(
        "grp AS priority",
        "n_train",
        "n_cal",
        "CAST(floor(mean_micro / 100000000.0 * 10000.0 + 0.5) / 10000.0"
        " AS DOUBLE) AS center",
        "CAST(floor(q_micro / 100000000.0 * 10000.0 + 0.5) / 10000.0"
        " AS DOUBLE) AS half_width",
        "CAST(floor(n_in * 1.0 / n_cal * 10000.0 + 0.5) / 10000.0"
        " AS DOUBLE) AS calib_coverage",
    ).orderBy("priority")


# --------------------------------------------------------------------------
# llm_hybrid_rrf — reciprocal-rank fusion of the lexical and dense legs
# --------------------------------------------------------------------------

from ..registry import ORACLE  # noqa: E402
from .textops import text_bm25_search  # noqa: E402  (registers its oracle)
from .dedup import sql_cosine, cosine  # noqa: E402

RRF_K = 60          # the standard damping constant (Cormack et al. 2009)
RRF_SCALE = 10 ** 12  # 1/(k+r) kept as floor(SCALE/(k+r)) — exact integer
RRF_TOP = 20
RRF_QUERY_VEC = 0   # the fixed dense query: embedding of vec_id 0


@register(
    "llm_hybrid_rrf",
    oracle=f"""
    WITH lex_raw AS ({{BM25}}),
    lex AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY score_q DESC, doc_id) AS r_lex
        FROM lex_raw),
    qv AS (SELECT embedding AS q FROM embeddings
           WHERE vec_id = {RRF_QUERY_VEC}),
    dense_scored AS (
        SELECT c.vec_id AS doc_id,
               CAST(floor({sql_cosine('c.embedding', 'qv.q')}
                          * 1000000000.0 + 0.5) AS BIGINT) AS cos_q
        FROM embeddings c CROSS JOIN qv
        WHERE c.vec_id <> {RRF_QUERY_VEC}),
    dense AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY cos_q DESC, doc_id) AS r_dense
        FROM dense_scored
        ORDER BY cos_q DESC, doc_id LIMIT {RRF_TOP}),
    fused AS (
        SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
               coalesce(l.r_lex, 0) AS r_lex,
               coalesce(d.r_dense, 0) AS r_dense,
               (CASE WHEN l.r_lex IS NULL THEN 0
                     ELSE {RRF_SCALE} // ({RRF_K} + l.r_lex) END)
               + (CASE WHEN d.r_dense IS NULL THEN 0
                       ELSE {RRF_SCALE} // ({RRF_K} + d.r_dense) END)
                   AS rrf_q
        FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(r_lex AS BIGINT) AS r_lex,
           CAST(r_dense AS BIGINT) AS r_dense,
           CAST(rrf_q AS BIGINT) AS rrf_q,
           CAST(rrf_q AS DOUBLE) / {RRF_SCALE}.0 AS rrf
    FROM fused
    ORDER BY rrf_q DESC, doc_id LIMIT {RRF_TOP}
    """.replace("{BM25}", "__BM25_ORACLE__"),
)
def llm_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
    Buettcher 2009 — the score-free fusion every hybrid search stack
    ships): fuse the LEXICAL leg (text_bm25_search's top-{RRF_TOP} for
    its fixed query, composed by calling the registered op) with the
    DENSE leg (quantized-cosine top-{RRF_TOP} against the fixed query
    embedding) by rrf(d) = sum over legs of 1/(k + rank_d), k={RRF_K}.
    Rank positions, not scores, cross the fusion boundary — the reason
    RRF needs no per-leg calibration.

    Determinism: each leg's ranking tie-breaks on doc_id (the dense
    cosine is quantized to an integer at 1e-9 BEFORE ranking); the RRF
    score is the exact integer floor({RRF_SCALE}/(k+r)) summed over
    legs — no float until the final descale. A leg miss contributes 0
    and reports rank 0.

    Scale shape: the lexical leg is the registered BM25 plan unchanged;
    the dense leg broadcasts the 1-row query vector through the
    embedding scan; fusion is a {RRF_TOP}-row full-outer join. At real
    scale the dense leg swaps in sim_search_ivf's bucketed candidates —
    the fusion stage is identical.
    """
    lex = text_bm25_search(spark, sf_dir).select(
        "doc_id",
        "score_q",
    )
    lex = lex.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score_q").desc(), "doc_id"))
        .alias("r_lex"),
    )
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("q")
    )
    dense = (
        emb.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.floor(
                cosine(F.col("embedding"), F.col("q")) * 1000000000.0
                + 0.5
            )
            .cast("long")
            .alias("cos_q"),
        )
        .orderBy(F.col("cos_q").desc(), "doc_id")
        .limit(RRF_TOP)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.col("cos_q").desc(), "doc_id"))
            .alias("r_dense"),
        )
    )
    fused = lex.join(
        dense.withColumnRenamed("doc_id", "d_doc_id"),
        F.col("doc_id") == F.col("d_doc_id"),
        "full_outer",
    ).selectExpr(
        "coalesce(doc_id, d_doc_id) AS doc_id",
        "coalesce(r_lex, 0) AS r_lex",
        "coalesce(r_dense, 0) AS r_dense",
        f"(CASE WHEN r_lex IS NULL THEN 0"
        f" ELSE {RRF_SCALE} div ({RRF_K} + r_lex) END)"
        f" + (CASE WHEN r_dense IS NULL THEN 0"
        f" ELSE {RRF_SCALE} div ({RRF_K} + r_dense) END) AS rrf_q",
    )
    return (
        fused.orderBy(F.col("rrf_q").desc(), "doc_id")
        .limit(RRF_TOP)
        .selectExpr(
            "CAST(doc_id AS BIGINT) AS doc_id",
            "CAST(r_lex AS BIGINT) AS r_lex",
            "CAST(r_dense AS BIGINT) AS r_dense",
            "CAST(rrf_q AS BIGINT) AS rrf_q",
            f"CAST(rrf_q AS DOUBLE) / {RRF_SCALE}.0 AS rrf",
        )
    )


# splice the registered BM25 oracle into the RRF twin now that both are
# registered (decoration-time f-strings can't nest the brace-heavy SQL)
ORACLE["llm_hybrid_rrf"] = ORACLE["llm_hybrid_rrf"].replace(
    "__BM25_ORACLE__", ORACLE["text_bm25_search"]
)


# --------------------------------------------------------------------------
# ml_qini_uplift — Qini curve for uplift targeting by activity decile
# --------------------------------------------------------------------------

QINI_BINS = 10


@register(
    "ml_qini_uplift",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS INT) AS treat,
               CAST(count(*) AS BIGINT) AS activity,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY 1),
    ranked AS (
        SELECT treat, conv,
               row_number() OVER (ORDER BY activity DESC, user_id) AS rk,
               count(*) OVER () AS n
        FROM per_user),
    binned AS (
        SELECT least(CAST((rk - 1) * {QINI_BINS} // n AS INT),
                     {QINI_BINS - 1}) AS bin, treat, conv
        FROM ranked),
    per_bin AS (
        SELECT bin,
               CAST(sum(treat) AS BIGINT) AS nt,
               CAST(sum(1 - treat) AS BIGINT) AS nc,
               CAST(sum(CASE WHEN treat = 1 THEN conv ELSE 0 END)
                    AS BIGINT) AS ct,
               CAST(sum(CASE WHEN treat = 0 THEN conv ELSE 0 END)
                    AS BIGINT) AS cc
        FROM binned GROUP BY 1),
    cum AS (
        SELECT bin,
               sum(nt) OVER w AS cnt_t, sum(nc) OVER w AS cnt_c,
               sum(ct) OVER w AS cum_ct, sum(cc) OVER w AS cum_cc
        FROM per_bin
        WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING))
    SELECT bin,
           CAST(cnt_t AS BIGINT) AS n_treat,
           CAST(cnt_c AS BIGINT) AS n_ctrl,
           CAST(cum_ct AS BIGINT) AS conv_treat,
           CAST(cum_cc AS BIGINT) AS conv_ctrl,
           floor((cum_ct - CAST(cum_cc AS DOUBLE) * cnt_t
                  / nullif(cnt_c, 0)) * 10000.0 + 0.5) / 10000.0
               AS qini
    FROM cum ORDER BY bin
    """,
)
def ml_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve (Radcliffe 2007 — THE uplift-modeling readout: how many
    INCREMENTAL conversions targeting the top-x% by a score buys over
    random): users randomize by id parity into treat/control, the
    targeting score is activity (event count), and per cumulative decile
    qini(x) = conv_t(x) - conv_c(x) * N_t(x)/N_c(x) — treated
    conversions minus the control conversions rescaled to the treated
    exposure. Completes the experimentation kit's TARGETING corner next
    to the average-effect readouts (delta method, CUPED, SPRT).

    Determinism: arms, conversions, and exposures are exact integers;
    the decile cut is integer rank arithmetic with a user_id tie-break;
    the single rescaling division is guarded by nullif and goes through
    the stable-round4 form.

    Scale shape (round-7 departition, VERDICT r6 "what's wrong" #2): the
    oracle's global ``row_number() OVER (ORDER BY activity DESC,
    user_id)`` is reconstructed WITHOUT a global sort — global rank =
    (#users with strictly higher activity) + (row_number within the
    equal-activity partition ordered by user_id). The offset table is a
    theta self-join over DISTINCT activity values (d ≪ |users|: activity
    is per-user event count, its support is small and heavy-tailed, so
    d² offset pairs are trivial at any corpus size and the frame
    broadcasts), and the within-activity window is PARTITIONED — no
    single-task sort of the user dimension anywhere. The {QINI_BINS}-row
    cumulative is a broadcast theta join over bins, not a window:
    tools/window_audit.py shows this op at 0 unpartitioned windows.
    """
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.expr("CAST(user_id % 2 AS INT)").alias("treat"),
        F.count("*").alias("activity"),
        F.expr(
            "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        ).alias("conv"),
    ).transform(pin)
    # ^ materialized ONCE: the offset table, the total, and the rank
    # assignment all branch from this |users|-sized frame — without the
    # checkpoint each branch re-scans the events fact (8 scans at plan
    # level). "Touch the fact once" is the whole point of the op.
    # rank offsets per distinct activity: off(a) = #users with activity > a
    acts = per_user.groupBy("activity").agg(F.count("*").alias("cnt"))
    hi = acts.select(
        F.col("activity").alias("h_act"), F.col("cnt").alias("h_cnt")
    )
    off = (
        acts.join(F.broadcast(hi), F.col("h_act") > F.col("activity"), "left")
        .groupBy("activity")
        .agg(F.coalesce(F.sum("h_cnt"), F.lit(0)).alias("off"))
    )
    n_total = per_user.agg(F.count("*").alias("n"))
    ranked = (
        per_user.join(F.broadcast(off), "activity")
        .withColumn(
            # LONG-safe within-tie numbering (round-10 partitioned-window
            # sweep): activity is a per-user COUNT, so tie groups are
            # Zipf-massed (activity=1 alone can exceed 2^31 users at
            # posture) — count-over-frame, never the int row_number
            "rn",
            F.count(F.lit(1)).over(
                W.partitionBy("activity")
                .orderBy("user_id")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .join(F.broadcast(n_total))
        .selectExpr("treat", "conv", "off + rn AS rk", "n")
    )
    binned = ranked.selectExpr(
        f"least(CAST((rk - 1) * {QINI_BINS} DIV n AS INT),"
        f" {QINI_BINS - 1}) AS bin",
        "treat",
        "conv",
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("treat").alias("nt"),
        F.sum(1 - F.col("treat")).alias("nc"),
        F.sum(F.expr("CASE WHEN treat = 1 THEN conv ELSE 0 END")).alias(
            "ct"
        ),
        F.sum(F.expr("CASE WHEN treat = 0 THEN conv ELSE 0 END")).alias(
            "cc"
        ),
    )
    # cumulative over <= QINI_BINS rows via broadcast theta join (<= bin),
    # not an unpartitioned window; the 10-row frame is pinned so the
    # theta join's two references don't re-run the user aggregation
    per_bin = per_bin.transform(pin)
    pb = per_bin.select(
        F.col("bin").alias("p_bin"),
        F.col("nt").alias("p_nt"),
        F.col("nc").alias("p_nc"),
        F.col("ct").alias("p_ct"),
        F.col("cc").alias("p_cc"),
    )
    cum = (
        per_bin.join(F.broadcast(pb), F.col("p_bin") <= F.col("bin"))
        .groupBy("bin")
        .agg(
            F.sum("p_nt").alias("cnt_t"),
            F.sum("p_nc").alias("cnt_c"),
            F.sum("p_ct").alias("cum_ct"),
            F.sum("p_cc").alias("cum_cc"),
        )
    )
    return cum.selectExpr(
        "bin",
        "CAST(cnt_t AS BIGINT) AS n_treat",
        "CAST(cnt_c AS BIGINT) AS n_ctrl",
        "CAST(cum_ct AS BIGINT) AS conv_treat",
        "CAST(cum_cc AS BIGINT) AS conv_ctrl",
        "CAST(floor((cum_ct - CAST(cum_cc AS DOUBLE) * cnt_t"
        " / nullif(cnt_c, 0)) * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS qini",
    ).orderBy("bin")


# --------------------------------------------------------------------------
# ml_srm_check — sample-ratio-mismatch guardrail (chi-square vs 50/50)
# --------------------------------------------------------------------------

# chi2(1) critical value at p = 0.001 — the SRM alarm threshold the
# platforms use (Fabijan et al. 2019); literal so no distribution code runs
SRM_CHI2_CRIT = 10.828


@register(
    "ml_srm_check",
    oracle=f"""
    WITH arms AS (
        SELECT CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS nt,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS nc
        FROM (SELECT DISTINCT user_id FROM events))
    SELECT CAST(nt AS BIGINT) AS n_treat,
           CAST(nc AS BIGINT) AS n_ctrl,
           floor((nt - nc) * (nt - nc) / (nt + nc) * 10000.0 + 0.5)
               / 10000.0 AS chi2,
           (nt - nc) * (nt - nc) / (nt + nc) > {SRM_CHI2_CRIT}
               AS srm_detected
    FROM arms
    """,
)
def ml_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail (Fabijan et al. 2019 — the FIRST
    check every experimentation platform runs: if the observed 50/50
    assignment split deviates beyond chance, the experiment's telemetry
    is broken and every downstream readout is invalid): chi-square of
    the observed arm counts against the designed equal split,
    chi2 = (nt - nc)^2 / (nt + nc), alarmed at the p = 0.001 critical
    value {SRM_CHI2_CRIT} (literal — no distribution function runs).
    Completes the experimentation kit's GUARDRAIL corner next to the
    effect readouts (delta method, CUPED, SPRT, power, Qini).

    Determinism: arm counts are exact integers from one distinct-user
    conditional aggregate; the statistic is one division through the
    stable-round4 form; the alarm is an exact comparison.

    Scale shape: one distinct-shuffle on user_id collapsing to a 1-row
    scalar aggregate — nothing wider than a row moves after the
    distinct.
    """
    e = load(spark, sf_dir, "events")
    arms = (
        e.select("user_id")
        .distinct()
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)"
                " AS DOUBLE)"
            ).alias("nt"),
            F.expr(
                "CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)"
                " AS DOUBLE)"
            ).alias("nc"),
        )
    )
    return arms.selectExpr(
        "CAST(nt AS BIGINT) AS n_treat",
        "CAST(nc AS BIGINT) AS n_ctrl",
        "CAST(floor((nt - nc) * (nt - nc) / (nt + nc) * 10000.0 + 0.5)"
        " / 10000.0 AS DOUBLE) AS chi2",
        f"(nt - nc) * (nt - nc) / (nt + nc) > {SRM_CHI2_CRIT}"
        " AS srm_detected",
    )


# --------------------------------------------------------------------------
# ml_diff_in_diff — 2x2 difference-in-differences on the user panel
# --------------------------------------------------------------------------

# cell means quantized to integers at 1e-9 BEFORE the DiD subtraction;
# the SE uses the four exact cell variances (independent-cells DiD SE)
_DID_VAR = "((n{c} * syy{c} - sy{c} * sy{c}) / nullif(n{c} * (n{c} - 1.0), 0.0) / nullif(n{c}, 0.0))"
_DID_SE = (
    "sqrt(greatest("
    + " + ".join(_DID_VAR.format(c=c) for c in ("t1", "t0", "c1", "c0"))
    + ", 0.0))"
)
_DID_EST = "((mt1 - mt0) - (mc1 - mc0))"


@register(
    "ml_diff_in_diff",
    oracle=f"""
    WITH span AS (
        SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
                + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS mid
        FROM events),
    panel AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS treat,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= mid
                    THEN 1 ELSE 0 END AS post,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events CROSS JOIN span),
    grid AS (
        SELECT u.user_id, u.treat, p.post
        FROM (SELECT DISTINCT user_id, treat FROM panel) u
        CROSS JOIN (SELECT unnest([0, 1]) AS post) p),
    per_up AS (
        SELECT g.user_id, g.treat, g.post,
               CAST(coalesce(sum(pl.y), 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN panel pl
            ON pl.user_id = g.user_id AND pl.post = g.post
        GROUP BY 1, 2, 3),
    cells AS (
        SELECT treat, post,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
               CAST((sum(CAST(y AS HUGEINT)) * 1000000000)
                    // count(*) AS BIGINT) AS m_q
        FROM per_up GROUP BY 1, 2),
    wide AS (
        SELECT
            max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS nt1,
            max(CASE WHEN treat = 1 AND post = 1 THEN sy END) AS syt1,
            max(CASE WHEN treat = 1 AND post = 1 THEN syy END) AS syyt1,
            max(CASE WHEN treat = 1 AND post = 1 THEN m_q END) AS mt1q,
            max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS nt0,
            max(CASE WHEN treat = 1 AND post = 0 THEN sy END) AS syt0,
            max(CASE WHEN treat = 1 AND post = 0 THEN syy END) AS syyt0,
            max(CASE WHEN treat = 1 AND post = 0 THEN m_q END) AS mt0q,
            max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS nc1,
            max(CASE WHEN treat = 0 AND post = 1 THEN sy END) AS syc1,
            max(CASE WHEN treat = 0 AND post = 1 THEN syy END) AS syyc1,
            max(CASE WHEN treat = 0 AND post = 1 THEN m_q END) AS mc1q,
            max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS nc0,
            max(CASE WHEN treat = 0 AND post = 0 THEN sy END) AS syc0,
            max(CASE WHEN treat = 0 AND post = 0 THEN syy END) AS syyc0,
            max(CASE WHEN treat = 0 AND post = 0 THEN m_q END) AS mc0q
        FROM cells),
    calc AS (
        SELECT CAST(nt1 AS BIGINT) AS n_treat_post,
               CAST(nc1 AS BIGINT) AS n_ctrl_post,
               CAST(mt1q AS DOUBLE) / 1000000000.0 AS mt1,
               CAST(mt0q AS DOUBLE) / 1000000000.0 AS mt0,
               CAST(mc1q AS DOUBLE) / 1000000000.0 AS mc1,
               CAST(mc0q AS DOUBLE) / 1000000000.0 AS mc0,
               nt1 AS nt1_, syt1 AS syt1_, syyt1 AS syyt1_,
               nt0, syt0, syyt0, nc1, syc1, syyc1, nc0, syc0, syyc0
        FROM wide)
    SELECT n_treat_post, n_ctrl_post,
           floor(mt1 * 10000.0 + 0.5) / 10000.0 AS mean_treat_post,
           floor(mt0 * 10000.0 + 0.5) / 10000.0 AS mean_treat_pre,
           floor(mc1 * 10000.0 + 0.5) / 10000.0 AS mean_ctrl_post,
           floor(mc0 * 10000.0 + 0.5) / 10000.0 AS mean_ctrl_pre,
           floor({_DID_EST} * 10000.0 + 0.5) / 10000.0 AS did,
           floor({_DID_SE} * 10000.0
                 + 0.5) / 10000.0 AS did_se
    FROM (SELECT n_treat_post, n_ctrl_post, mt1, mt0, mc1, mc0,
                 nt1_ AS nt1, syt1_ AS syt1, syyt1_ AS syyt1,
                 nt0, syt0, syyt0, nc1, syc1, syyc1, nc0, syc0, syyc0
          FROM calc)
    """,
)
def ml_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 difference-in-differences (Card & Krueger 1994 framing) on the
    user panel: treat = id parity, periods split at the exact integer
    midpoint of the event-time span, outcome = per-user purchase count
    per period (zero-filled on the full user x period grid, so quiet
    users count). DiD = (treat post - pre) - (ctrl post - pre); the SE
    sums the four independent cell variances of the user-level means.
    The causal-inference member of the experimentation kit that handles
    a PRE-period — complements agg_cuped (variance reduction) with the
    parallel-trends identification readout.

    Determinism: the period cutoff is exact integer epoch arithmetic;
    per-user outcomes are exact integer counts on an explicit grid;
    cell means are integer divisions at 1e-9 BEFORE the DiD
    subtraction; sufficient statistics are exact HUGEINT/DECIMAL(38)
    sums; the SE expression text is interpolated verbatim into both
    engines; stable_round4 on every output rational.

    Scale shape: one scan for the span scalar (broadcast), one scan
    into a (user, period)-keyed partial agg, a broadcast 2-row period
    grid against the distinct-user frame, then a 4-row cell rollup
    pivoted to one row. Nothing wider than the user dimension shuffles.
    """
    e = load(spark, sf_dir, "events")
    span = e.agg(
        F.expr(
            "(CAST(unix_timestamp(min(ts)) AS BIGINT)"
            " + CAST(unix_timestamp(max(ts)) AS BIGINT)) div 2"
        ).alias("mid")
    )
    panel = e.crossJoin(F.broadcast(span)).selectExpr(
        "user_id",
        "CAST(user_id % 2 AS INT) AS treat",
        "CASE WHEN CAST(unix_timestamp(ts) AS BIGINT) >= mid"
        " THEN 1 ELSE 0 END AS post",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y",
    )
    users = panel.select("user_id", "treat").distinct()
    periods = literal_frame(spark, [(0,), (1,)], "post int")
    grid = users.crossJoin(F.broadcast(periods))
    counts = panel.groupBy("user_id", "post").agg(
        F.sum("y").alias("y_raw")
    )
    per_up = (
        grid.join(counts, ["user_id", "post"], "left")
        .select(
            "treat",
            "post",
            F.coalesce("y_raw", F.lit(0)).cast("long").alias("y"),
        )
    )
    cells = per_up.groupBy("treat", "post").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y"))
        .cast("double")
        .alias("syy"),
        F.expr(
            "CAST((sum(CAST(y AS DECIMAL(38,0))) * 1000000000)"
            " div count(*) AS BIGINT)"
        ).alias("m_q"),
    )

    def cell(tr, po, col):
        return (
            f"max(CASE WHEN treat = {tr} AND post = {po}"
            f" THEN {col} END)"
        )

    wide = cells.selectExpr(
        *(
            f"{cell(tr, po, col)} AS {col}{tag}"
            for tag, tr, po in (
                ("t1", 1, 1), ("t0", 1, 0), ("c1", 0, 1), ("c0", 0, 0)
            )
            for col in ("n", "sy", "syy", "m_q")
        )
    )
    calc = wide.selectExpr(
        "CAST(nt1 AS BIGINT) AS n_treat_post",
        "CAST(nc1 AS BIGINT) AS n_ctrl_post",
        "CAST(m_qt1 AS DOUBLE) / 1000000000.0 AS mt1",
        "CAST(m_qt0 AS DOUBLE) / 1000000000.0 AS mt0",
        "CAST(m_qc1 AS DOUBLE) / 1000000000.0 AS mc1",
        "CAST(m_qc0 AS DOUBLE) / 1000000000.0 AS mc0",
        "nt1", "syt1", "syyt1", "nt0", "syt0", "syyt0",
        "nc1", "syc1", "syyc1", "nc0", "syc0", "syyc0",
    )
    return calc.selectExpr(
        "n_treat_post",
        "n_ctrl_post",
        "CAST(floor(mt1 * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS mean_treat_post",
        "CAST(floor(mt0 * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS mean_treat_pre",
        "CAST(floor(mc1 * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS mean_ctrl_post",
        "CAST(floor(mc0 * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS mean_ctrl_pre",
        f"CAST(floor({_DID_EST} * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS did",
        f"CAST(floor({_DID_SE} * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS did_se",
    )


# --------------------------------------------------------------------------
# ml_tost_equivalence — two one-sided tests for arm equivalence
# --------------------------------------------------------------------------

TOST_Z = 1.645       # one-sided z at alpha = 0.05, literal
TOST_MARGIN_PCT = 1  # equivalence margin: 1% of the pooled mean

_TOST_SE = (
    "sqrt(greatest((n1 * s1q - s1 * s1) / nullif(n1 * n1 * (n1 - 1.0), 0.0)"
    " + (n0 * s0q - s0 * s0) / nullif(n0 * n0 * (n0 - 1.0), 0.0), 0.0))"
)
_TOST_DIFF = "(s1 / n1 - s0 / n0)"
_TOST_DELTA = f"(({TOST_MARGIN_PCT} / 100.0) * (s1 + s0) / (n1 + n0))"
_TOST_TLO = f"(({_TOST_DIFF} + {_TOST_DELTA}) / nullif({_TOST_SE}, 0.0))"
_TOST_THI = f"(({_TOST_DELTA} - {_TOST_DIFF}) / nullif({_TOST_SE}, 0.0))"


@register(
    "ml_tost_equivalence",
    oracle=f"""
    WITH base AS (
        SELECT CAST(o_custkey % 2 AS INT) AS arm,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders),
    st AS (
        SELECT
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                AS n1,
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                AS n0,
            CAST(sum(CASE WHEN arm = 1 THEN CAST(cents AS HUGEINT)
                          ELSE 0 END) AS DOUBLE) / 100.0 AS s1,
            CAST(sum(CASE WHEN arm = 0 THEN CAST(cents AS HUGEINT)
                          ELSE 0 END) AS DOUBLE) / 100.0 AS s0,
            CAST(sum(CASE WHEN arm = 1 THEN CAST(cents AS HUGEINT) * cents
                          ELSE 0 END) AS DOUBLE) / 10000.0 AS s1q,
            CAST(sum(CASE WHEN arm = 0 THEN CAST(cents AS HUGEINT) * cents
                          ELSE 0 END) AS DOUBLE) / 10000.0 AS s0q
        FROM base)
    SELECT CAST(n1 AS BIGINT) AS n_arm1,
           CAST(n0 AS BIGINT) AS n_arm0,
           floor({_TOST_DIFF} * 10000.0 + 0.5) / 10000.0 AS mean_diff,
           floor({_TOST_DELTA} * 10000.0 + 0.5) / 10000.0 AS margin,
           floor({_TOST_TLO} * 10000.0 + 0.5) / 10000.0 AS t_lower,
           floor({_TOST_THI} * 10000.0 + 0.5) / 10000.0 AS t_upper,
           ({_TOST_TLO} > {TOST_Z}) AND ({_TOST_THI} > {TOST_Z})
               AS equivalent
    FROM st
    """,
)
def ml_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (Schuirmann 1987 — the NON-INFERIORITY
    readout: a significant t-test proves arms differ, TOST proves they
    DON'T, within a margin; the launch criterion for "this change is
    safe"): two one-sided Welch z-tests of the arm mean-value difference
    against ±{TOST_MARGIN_PCT}% of the pooled mean, equivalent iff BOTH
    reject at the literal one-sided z {TOST_Z}. Completes the
    experimentation kit's acceptance corner next to the difference
    readouts (ztest, delta method, SPRT) and the guardrails (SRM).

    Determinism: per-arm sufficient statistics are exact HUGEINT/
    DECIMAL(38) sums of integer cents descaled by literal powers of
    100; diff, margin, SE, and both t statistics are expression text
    interpolated VERBATIM into both engines; stable_round4 on every
    rational; degenerate arms NULL-propagate through nullif.

    Scale shape: ONE conditional scalar aggregate over orders — the
    whole test is six sums wide and one row tall; nothing wider than a
    row moves.
    """
    o = load(spark, sf_dir, "orders")
    base = o.select(
        F.expr("CAST(o_custkey % 2 AS INT)").alias("arm"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    st = base.agg(
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE)"
        ).alias("n1"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE)"
        ).alias("n0"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN CAST(cents AS DECIMAL(38,0))"
            " ELSE 0 END) AS DOUBLE) / 100.0"
        ).alias("s1"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN CAST(cents AS DECIMAL(38,0))"
            " ELSE 0 END) AS DOUBLE) / 100.0"
        ).alias("s0"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN CAST(cents AS DECIMAL(38,0))"
            " * cents ELSE 0 END) AS DOUBLE) / 10000.0"
        ).alias("s1q"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN CAST(cents AS DECIMAL(38,0))"
            " * cents ELSE 0 END) AS DOUBLE) / 10000.0"
        ).alias("s0q"),
    )
    return st.selectExpr(
        "CAST(n1 AS BIGINT) AS n_arm1",
        "CAST(n0 AS BIGINT) AS n_arm0",
        f"CAST(floor({_TOST_DIFF} * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS mean_diff",
        f"CAST(floor({_TOST_DELTA} * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS margin",
        f"CAST(floor({_TOST_TLO} * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS t_lower",
        f"CAST(floor({_TOST_THI} * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
        " AS t_upper",
        f"({_TOST_TLO} > {TOST_Z}) AND ({_TOST_THI} > {TOST_Z})"
        " AS equivalent",
    )


# --------------------------------------------------------------------------
# ml_ucb_allocation — UCB1 bandit arm selection over event types
# --------------------------------------------------------------------------

# the single libm ln is quantized with the house midpoint offset so a
# JVM-vs-libm ulp cannot flip the selection (statsml2's DP-noise guard)
_UCB_LNQ = "floor(ln(nn) * 1000000.0 + 0.5) / 1000000.0"
_UCB_MEAN = "(CAST(mean_micro AS DOUBLE) / 1000000.0)"
_UCB_BONUS = f"sqrt(2.0 * {_UCB_LNQ} / n)"
_UCB = f"({_UCB_MEAN} + {_UCB_BONUS})"


@register(
    "ml_ucb_allocation",
    oracle=f"""
    WITH arms AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               CAST((sum(CAST(CAST(round(value * 100, 0) AS BIGINT)
                              AS HUGEINT)) * 10000)
                    // count(*) AS BIGINT) AS mean_micro
        FROM events GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM arms),
    scored AS (
        SELECT event_type, n, mean_micro, {_UCB} AS ucb
        FROM arms CROSS JOIN tot),
    mx AS (SELECT max(ucb) AS m FROM scored)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_pulls,
           floor({_UCB_MEAN} * 10000.0 + 0.5) / 10000.0 AS mean_value,
           floor(ucb * 10000.0 + 0.5) / 10000.0 AS ucb,
           CASE WHEN ucb = m THEN 1 ELSE 0 END AS is_chosen
    FROM scored CROSS JOIN mx
    ORDER BY ucb DESC, event_type
    """,
)
def ml_ucb_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit allocation (Auer, Cesa-Bianchi & Fischer 2002 — the
    optimism-under-uncertainty rule behind adaptive traffic allocation):
    each event type is an arm, its reward the event value; the next-pull
    choice maximizes mean + sqrt(2 ln N / n), trading exploitation (the
    mean) against exploration (rarely-pulled arms get a bigger bonus).
    Completes the experimentation kit's ADAPTIVE corner next to the
    fixed-horizon tests (ztest, TOST) and the sequential SPRT.

    Determinism: per-arm means are exact integer divisions to 1e-6 from
    HUGEINT/DECIMAL(38) cent sums; the single libm ln is quantized with
    the midpoint offset (the statsml2 DP-noise guard) so a JVM-vs-libm
    ulp cannot flip the argmax; sqrt and division are IEEE
    correctly-rounded, so the ucb doubles are bit-identical across
    engines; selection ties carry the full (ucb, event_type) order.

    Scale shape: one map-side-combinable aggregate to |arms| rows; the
    corpus total and the max are broadcast 1-row scalars. The statistic
    a streaming allocator would maintain incrementally is exactly this
    aggregate's partial state.
    """
    e = load(spark, sf_dir, "events")
    arms = e.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.expr(
            "CAST((sum(CAST(CAST(round(value * 100, 0) AS BIGINT)"
            " AS DECIMAL(38,0))) * 10000) div count(*) AS BIGINT)"
        ).alias("mean_micro"),
    )
    tot = arms.agg(F.sum("n").alias("nn"))
    scored = arms.crossJoin(F.broadcast(tot)).selectExpr(
        "event_type", "n", "mean_micro", f"{_UCB} AS ucb"
    )
    mx = scored.agg(F.max("ucb").alias("m"))
    return (
        scored.crossJoin(F.broadcast(mx))
        .selectExpr(
            "event_type",
            "CAST(n AS BIGINT) AS n_pulls",
            f"CAST(floor({_UCB_MEAN} * 10000.0 + 0.5) / 10000.0"
            " AS DOUBLE) AS mean_value",
            "CAST(floor(ucb * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"
            " AS ucb",
            "CASE WHEN ucb = m THEN 1 ELSE 0 END AS is_chosen",
        )
        .orderBy(F.col("ucb").desc(), "event_type")
    )
