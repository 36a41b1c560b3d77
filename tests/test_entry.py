"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import importlib

spark_entry = importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = spark_entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


def test_queries_registry_shape(spark):
    qs = spark_entry.queries()
    oracles = spark_entry.oracle_sql()
    assert len(qs) >= 3
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_flagship_runs_at_smoke_sf(spark, sf_dir):
    qs = spark_entry.queries()
    df = qs["tpch_q3_shipping_priority"](spark, sf_dir)
    out = df.collect()
    assert len(out) <= 10
    assert set(df.columns) == {"o_orderkey", "revenue", "o_orderdate", "o_orderpriority"}


def test_driver_prefix_covers_flagships():
    """The driver oracle-checks the FIRST 50 queries() entries. Round-6
    window policy (VERDICT r5 #2): the 5 EVER-FAILED rows stay pinned
    forever; the 8 never-failed LLM north stars rotate OUT (each has a
    driver-green row in CORRECTNESS_r0{3,5}.json) so all 45 remaining
    slots burn the never-sampled backlog. The north stars must stay
    registered AND oracle-backed — their correctness is carried by the
    full local gate and their historical driver rows."""
    import __spark_entry__ as m

    first50 = list(m.queries())[:50]
    for pinned in (
        "win_session_features",
        "snk_scd2",
        "emb_normalize",
        "emb_quantize_int8",
        "tpch_q12_priority_counts",
    ):
        assert pinned in first50, pinned

    oracles = m.oracle_sql()
    qs = m.queries()
    for flagship in (
        "dedup_minhash_lsh",
        "sim_search_ivf",
        "text_tfidf_topterms",
        "pipeline_corpus_curation",
        "llm_summarize",
        "mm_binary_meta",
        "join_fuzzy_topk",
        "stream_tumbling_window",
    ):
        assert flagship in qs and flagship in oracles, flagship

    # every window slot is oracle-backed and first-time rows dominate:
    # the fill must never burn a slot on an already-driver-green query
    assert len(first50) == 50
    assert all(n in oracles for n in first50)
