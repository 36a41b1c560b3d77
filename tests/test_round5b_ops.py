"""Round-5 continuation unit tests: online Poisson bootstrap, Count-Min
sketch, isotonic calibration — invariants on the sf0.001 fixture plus a
known-answer Count-Min case on a constructed heavy-hitter corpus."""

from __future__ import annotations

import datetime as dt

from repcheck_data_integration_spark import registry

registry.load_all_modules()


def test_poisson_bootstrap_envelope_and_determinism(spark, sf_dir):
    """One row; the replicate envelope is ordered, the SE positive, and
    the whole mechanism replayable (md5 draws, not rand())."""
    q = registry.QUERIES["ml_poisson_bootstrap"]
    a = q(spark, sf_dir).collect()
    assert len(a) == 1
    r = a[0]
    assert r["boot_lo"] <= r["boot_hi"]
    assert r["boot_se"] > 0.0
    assert r["mean_obs"] > 0.0
    # the observed mean sits inside (or on) the 93.75% replicate envelope
    # widened by 3 SEs — a loose sanity band, not a statistical test
    assert r["boot_lo"] - 3 * r["boot_se"] <= r["mean_obs"]
    assert r["mean_obs"] <= r["boot_hi"] + 3 * r["boot_se"]
    b = q(spark, sf_dir).collect()[0]
    assert a[0] == b


def test_countmin_one_sided_error(spark, sf_dir):
    """CMS point estimates never undercount: est >= truth on every
    certified heavy hitter."""
    rows = registry.QUERIES["agg_countmin_heavyhitters"](
        spark, sf_dir
    ).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"]
        assert r["overestimate"] == r["cms_est"] - r["true_cnt"]


def test_countmin_known_heavy_hitter(spark, tmp_path):
    """A constructed corpus with one dominant user: the sketch's top
    certified row is that user and its estimate bounds the true count."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for _ in range(200):  # user 1: 200 events
        rows.append((eid, t0, 1, "view", 1.0, "{}"))
        eid += 1
    for u in range(2, 42):  # 40 light users, 3 events each
        for _ in range(3):
            rows.append((eid, t0, u, "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = registry.QUERIES["agg_countmin_heavyhitters"](
        spark, str(tmp_path)
    ).collect()
    assert out[0]["user_id"] == 1
    assert out[0]["true_cnt"] == 200
    assert out[0]["cms_est"] >= 200


def test_isotonic_monotone_and_mean_preserving(spark, sf_dir):
    """PAV output is non-decreasing in bin, bounded in [0, 1], and
    preserves the count-weighted mean rate (the PAV fixed-point
    property), up to the 1e-12 quantize + round4."""
    rows = registry.QUERIES["ml_isotonic_calibration"](
        spark, sf_dir
    ).collect()
    assert len(rows) == 10
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)
    assert all(0.0 <= v <= 1.0 for v in iso)
    w_raw = sum(r["n_bin"] * r["raw_rate"] for r in rows)
    w_iso = sum(r["n_bin"] * r["iso_rate"] for r in rows)
    assert abs(w_raw - w_iso) <= 1e-3 * sum(r["n_bin"] for r in rows)


def test_keep_first_partitions_hash_space(spark, sf_dir):
    """Across the corpus, exactly one instance per distinct segment hash
    survives: sum(n_kept) == |distinct hashes|, and every doc keeps at
    least zero, at most all, of its segments."""
    from repcheck_data_integration_spark.tables import load
    from pyspark.sql import functions as F

    rows = registry.QUERIES["dedup_paragraphs_keep_first"](
        spark, sf_dir
    ).collect()
    kept = sum(r["n_kept"] for r in rows)
    d = load(spark, sf_dir, "documents")
    n_hashes = (
        d.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, greatest(length(text)-1,0)"
                    " div 120), i -> md5(substr(text, i*120+1, 120)))"
                )
            ).alias("sh")
        )
        .distinct()
        .count()
    )
    assert kept == n_hashes
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_segs"]
        assert 0.0 <= r["kept_frac"] <= 1.0


def test_cidr_lpm_prefers_most_specific(spark, sf_dir):
    """Every routed row is one of the three levels; /16 networks sit
    inside a /8 that also exists, so their traffic proves LPM beat the
    shorter prefix; counts add up to the distinct-user total."""
    from repcheck_data_integration_spark.tables import load

    rows = registry.QUERIES["join_cidr_lookup"](spark, sf_dir).collect()
    levels = {r["prefix_len"] for r in rows}
    assert levels <= {"/16", "/8", "unrouted"}
    total = sum(r["n_users"] for r in rows)
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert total == n_users
    for r in rows:
        if r["prefix_len"] == "/16":
            assert r["network"].endswith(".0.0/16")
        if r["prefix_len"] == "/8":
            assert r["network"].endswith(".0.0.0/8")


def test_noisy_max_selects_and_replays(spark, sf_dir):
    """Exactly one selected candidate (max with name tie-break would
    still mark ties — assert >= 1 and that selected rows carry the max),
    noise is bounded by the geometric cap, and the mechanism replays
    bit-identically."""
    from repcheck_data_integration_spark.tables import load
    from pyspark.sql import functions as F

    q = registry.QUERIES["priv_noisy_max"]
    a = q(spark, sf_dir).collect()
    sel = [r for r in a if r["is_selected"] == 1]
    assert len(sel) >= 1
    mx = max(r["noisy_n"] for r in a)
    assert all(r["noisy_n"] == mx for r in sel)
    truth = {
        r["event_type"]: r["cnt"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    for r in a:
        assert abs(r["noisy_n"] - truth[r["event_type"]]) <= 18
    assert a == q(spark, sf_dir).collect()
