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
