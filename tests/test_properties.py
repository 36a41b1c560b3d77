"""Property-based tests (hypothesis) for the algebraic invariants the
engine's correctness story leans on. Example counts are kept small —
each example round-trips through the JVM."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from repcheck_data_integration_spark.functions.kernels import uuid5
from repcheck_data_integration_spark.operators.spatial import bbox_grid_join
from repcheck_data_integration_spark.operators.upsert import merge_upsert

FAST = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.text(alphabet="abcde", min_size=1, max_size=3)


@FAST
@given(
    target=st.dictionaries(keys, st.integers(0, 100), max_size=5),
    source=st.dictionaries(keys, st.integers(0, 100), max_size=5),
)
def test_merge_upsert_semantics_and_idempotence(spark, target, source):
    """merge(t, s) == t ⊕ s (source wins on conflicts, union of keys), and
    re-applying the same source is a no-op (the reference's blind-re-run
    contract, database.py:52-73)."""
    t = spark.createDataFrame(
        list(target.items()) or [("_", -1)], ["id", "val"]
    )
    s = spark.createDataFrame(
        list(source.items()) or [("_", -1)], ["id", "val"]
    )
    once = merge_upsert(t, s, keys=["id"], preserve=())
    expected = {**target, **source} if target or source else {"_": -1}
    if not target:
        expected = {**{"_": -1}, **source}
    if not source:
        expected = {**target, **{"_": -1}}
    assert {r["id"]: r["val"] for r in once.collect()} == expected
    twice = merge_upsert(once, s, keys=["id"], preserve=())
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))


rects = st.lists(
    st.tuples(
        st.integers(-20, 20), st.integers(-20, 20),
        st.integers(0, 15), st.integers(0, 15),
    ),
    min_size=1,
    max_size=6,
)


@FAST
@given(left=rects, right=rects, cell=st.sampled_from([1.0, 3.0, 7.5]))
def test_bbox_grid_join_equals_naive(spark, left, right, cell):
    lrows = [
        (i, float(x), float(y), float(x + w), float(y + h))
        for i, (x, y, w, h) in enumerate(left)
    ]
    rrows = [
        (j, float(x), float(y), float(x + w), float(y + h))
        for j, (x, y, w, h) in enumerate(right)
    ]
    naive = {
        (a[0], b[0])
        for a in lrows
        for b in rrows
        if a[1] <= b[3] and a[3] >= b[1] and a[2] <= b[4] and a[4] >= b[2]
    }
    ldf = spark.createDataFrame(lrows, ["lid", "lx0", "ly0", "lx1", "ly1"])
    rdf = spark.createDataFrame(rrows, ["rid", "rx0", "ry0", "rx1", "ry1"])
    got = {
        (r["lid"], r["rid"])
        for r in bbox_grid_join(
            ldf,
            rdf,
            cell=cell,
            left_bbox=("lx0", "ly0", "lx1", "ly1"),
            right_bbox=("rx0", "ry0", "rx1", "ry1"),
        ).collect()
    }
    assert got == naive


@FAST
@given(names=st.lists(st.text(max_size=20), min_size=1, max_size=5, unique=True))
def test_uuid5_matches_stdlib_on_arbitrary_text(spark, names):
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        r["name"]: r["u"]
        for r in df.select("name", uuid5(F.col("name")).alias("u")).collect()
    }
    for n in names:
        assert got[n] == str(uuid.uuid5(uuid.NAMESPACE_OID, n))


# --- pdf writer/extractor roundtrip under arbitrary text ------------------

# pure-python kernel: no JVM per example, so examples can be generous
PDF_SETTINGS = settings(max_examples=120, deadline=None)


@PDF_SETTINGS
@given(text=st.text(max_size=400), wrap=st.integers(4, 120))
def test_pdf_roundtrip_property(text, wrap):
    """For ARBITRARY unicode text and wrap widths: extract(write(text)) ==
    the latin-1 projection hard-wrapped with empties dropped — the exact
    contract llm_pdf_extract leans on. Exercises escape handling,
    parenthesis nesting, control bytes, and CR/LF payloads the
    example-based tests can't enumerate."""
    from repcheck_data_integration_spark.sources.pdftext import (
        extract_pdf_text,
        pdf_from_text,
    )

    got = extract_pdf_text(pdf_from_text(text, wrap=wrap))
    proj = text.encode("latin-1", errors="ignore").decode("latin-1")
    lines = []
    for ln in proj.split("\n"):
        for off in range(0, max(len(ln), 1), wrap):
            lines.append(ln[off : off + wrap])
    assert got == "\n".join(ln for ln in lines if ln)


@FAST
@given(
    groups=st.lists(
        st.tuples(
            # cents values up to $100M customers, tie-group counts up to
            # 5e9 — the magnitudes where LONG arithmetic wrapped pre-r10
            st.integers(1, 10_000_000_000),
            st.integers(1, 5_000_000_000),
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda t: t[0],
    )
)
def test_gini_pivot_matches_exact_rationals(spark, groups):
    """The decimal gini pivot equals exact python-rational Gini for any
    (cents, cnt) offsets table, including magnitudes where every LONG
    intermediate (t, n*t, rank-sum) would have wrapped (round-10 sweep)."""
    import math

    from repcheck_data_integration_spark.operators.aggregates import (
        _gini_pivot,
    )

    groups = sorted(groups)
    rows, off = [], 0
    for cents, cnt in groups:
        rows.append((cents, cnt, off))
        off += cnt
    n = sum(c for _, c, _ in rows)
    t = sum(v * c for v, c, _ in rows)
    iw = sum(v * (c * o + c * (c + 1) // 2) for v, c, o in rows)
    # mirror the pivot's exact float sequence (exact decimal integers,
    # ONE rounding per double conversion) so the compare can't 1-ulp
    # flake at a quantization boundary
    g = 2.0 * float(iw) / float(n * t) - float(n + 1) / float(n)
    want = math.floor(g * 10000.0 + 0.5) / 10000.0
    got = _gini_pivot(
        spark.createDataFrame(rows, "cents long, cnt long, off_cnt long")
    ).collect()[0]
    assert got["n_customers"] == n
    assert got["gini"] == want, (rows, got["gini"], want)
