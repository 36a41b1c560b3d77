"""Round-8 unit tests.

- prefix_offsets (operators/prefix.py): the deterministic min/max-
  bucketed prefix scan that replaced the last dimension-sized
  unpartitioned windows must produce exactly the exclusive prefix sums
  a single-task sort would have.
- agg_rfm_scores boundary jitter (ADVICE r7): the op's correctness rests
  on Spark's exact `percentile` and DuckDB's `quantile_cont` being
  bit-identical on integer inputs — pin that on the adversarial inputs
  the docstring claims (exact halves, 0.2*(n-1) float-error positions,
  all-ties), not just on fixture luck.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from repcheck_data_integration_spark.operators.prefix import prefix_offsets


def _brute(rows, asc, sum_cols):
    order = sorted(rows, key=lambda r: r["v"], reverse=not asc)
    acc = {c: 0 for c in sum_cols}
    exp = {}
    for r in order:
        exp[r["v"]] = {f"off_{c}": acc[c] for c in sum_cols}
        for c in sum_cols:
            acc[c] += r[c]
    return exp


@pytest.mark.parametrize("asc", [True, False])
def test_prefix_offsets_matches_bruteforce(spark, asc):
    rng = random.Random(8)
    vals = rng.sample(range(100000), 500)
    rows = [{"v": v, "cnt": (v % 7) + 1, "s": v * 3} for v in vals]
    df = spark.createDataFrame(rows)
    out = prefix_offsets(df, "v", ["cnt", "s"], ascending=asc, nbuckets=8)
    got = {r["v"]: r.asDict() for r in out.collect()}
    exp = _brute(rows, asc, ["cnt", "s"])
    assert set(got) == set(exp)
    for v, e in exp.items():
        assert got[v]["off_cnt"] == e["off_cnt"], (asc, v)
        assert got[v]["off_s"] == e["off_s"], (asc, v)
        # original columns survive untouched
        assert got[v]["cnt"] == (v % 7) + 1


def test_prefix_offsets_more_partitions_than_rows(spark):
    rows = [{"v": 5, "cnt": 2}, {"v": 3, "cnt": 4}, {"v": 9, "cnt": 1}]
    out = prefix_offsets(
        spark.createDataFrame(rows), "v", ["cnt"], ascending=True, nbuckets=16
    )
    got = {r["v"]: r["off_cnt"] for r in out.collect()}
    assert got == {3: 0, 5: 4, 9: 6}


def test_prefix_offsets_single_row(spark):
    df = spark.createDataFrame([{"v": 7, "cnt": 3}])
    row = prefix_offsets(df, "v", ["cnt"], nbuckets=4).collect()[0]
    assert row["off_cnt"] == 0 and row["cnt"] == 3


def test_prefix_offsets_clustered_and_negative_values(spark):
    """Degenerate domains: all values inside one bucket width (the skew
    worst case collapses to a single within-bucket window — still
    correct), and negative values (bucket id = (v - min) DIV width must
    stay non-negative)."""
    rows = [{"v": 1000000 + i, "cnt": i + 1} for i in range(50)]
    got = {
        r["v"]: r["off_cnt"]
        for r in prefix_offsets(
            spark.createDataFrame(rows), "v", ["cnt"], nbuckets=4096
        ).collect()
    }
    exp = _brute(rows, True, ["cnt"])
    assert got == {v: e["off_cnt"] for v, e in exp.items()}

    rows = [{"v": v, "cnt": 1} for v in (-100, -3, 0, 7, 250)]
    got = {
        r["v"]: r["off_cnt"]
        for r in prefix_offsets(
            spark.createDataFrame(rows), "v", ["cnt"], ascending=False,
            nbuckets=8,
        ).collect()
    }
    assert got == {250: 0, 7: 1, 0: 2, -3: 3, -100: 4}


# --- RFM percentile boundary jitter (ADVICE r7) ----------------------------

# each case targets a failure mode of cross-engine linear interpolation at
# p*(n-1): exact .5 fractions, float-representation error in the position
# (0.2*6 = 1.2000000000000002 in binary), integer positions (no
# interpolation at all), all-ties, and a 90/10 split that puts three of the
# four boundaries inside one tie run
_JITTER_CASES = {
    "exact_half_fracs": [10, 11],
    "integer_positions": [0, 1, 2, 3, 4, 5],
    "float_error_position": list(range(7)),
    "float_error_longer": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],
    "all_ties": [42] * 13,
    "tie_run_boundary": [1] * 9 + [2],
    "big_ints_precision": [10**15 + k for k in (0, 1, 3, 7, 11)],
}


@pytest.mark.parametrize("name", sorted(_JITTER_CASES))
def test_rfm_percentile_boundary_jitter(spark, name):
    """Spark exact-percentile vs DuckDB quantile_cont, BIT equality on the
    four RFM quintile boundaries (agg_rfm_scores' cross-engine contract:
    the strict </> bucket comparisons then land identically because the
    metrics are exact integers a full unit away from any rounding)."""
    xs = _JITTER_CASES[name]
    sdf = spark.createDataFrame([(x,) for x in xs], "x long")
    got = list(
        sdf.agg(
            F.expr("percentile(x, array(0.2D, 0.4D, 0.6D, 0.8D))")
        ).first()[0]
    )
    lit = ", ".join(str(x) for x in xs)
    exp = list(
        duckdb.sql(
            f"SELECT quantile_cont(x, [0.2, 0.4, 0.6, 0.8]) FROM "
            f"(SELECT unnest([{lit}]::BIGINT[]) AS x)"
        ).fetchone()[0]
    )
    assert got == exp, (name, got, exp)


# --- split_leakage_safe: the no-leakage invariant ---------------------------


def test_split_leakage_safe_clusters_never_straddle(spark):
    """Every near-dup cluster lands in exactly ONE split; singleton docs
    keep the plain hash-of-own-id assignment (reprocessing stability)."""
    from repcheck_data_integration_spark import registry

    registry.load_all_modules()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["split_leakage_safe"](spark, sf).collect()
    comp = {
        r["doc_id"]: r["canonical_doc_id"]
        for r in registry.QUERIES["dedup_components"](spark, sf).collect()
    }
    by_key: dict[int, set] = {}
    for r in rows:
        by_key.setdefault(r["split_key"], set()).add(r["split"])
        if r["doc_id"] in comp:
            assert r["split_key"] == comp[r["doc_id"]]
        else:
            assert r["split_key"] == r["doc_id"]
    assert all(len(s) == 1 for s in by_key.values())
    # sanity: the fixture actually HAS a multi-member cluster, so the
    # invariant is exercised, not vacuous
    from collections import Counter

    sizes = Counter(comp.values())
    assert any(v >= 2 for v in sizes.values())
    # and the plain split would have straddled at least one cluster in
    # general — verify the op's key differs from doc_id for members
    assert any(r["split_key"] != r["doc_id"] for r in rows)


def test_prefix_offsets_range_overflow_fails_loudly(spark):
    """A value range wider than the LONG domain wraps (max - min)
    negative; the woven assert_true must raise, never bucket garbage."""
    rows = [{"v": -(2**62), "cnt": 1}, {"v": 2**62, "cnt": 1}]
    df = spark.createDataFrame(rows)
    # ANSI mode already throws ARITHMETIC_OVERFLOW on (max - min); the
    # woven assert_true is the belt for non-ANSI sessions — either way
    # the failure is loud, never silent garbage buckets
    with pytest.raises(Exception, match="(?i)overflow|assert|LONG domain"):
        prefix_offsets(df, "v", ["cnt"], nbuckets=8).collect()
