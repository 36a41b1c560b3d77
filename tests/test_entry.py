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
    """The driver oracle-checks the FIRST 50 queries() entries; the prefix
    must cover the LLM-pipeline north stars, not just TPC-H."""
    import __spark_entry__ as m

    first50 = list(m.queries())[:50]
    for flagship in (
        # r3 driver failures, fixed in r4 — MUST be driver-visible this
        # round (VERDICT r3: never rotate a failure out of the window)
        "win_session_features",
        "snk_scd2",
        "emb_normalize",
        "emb_quantize_int8",
        "tpch_q12_priority_counts",
        # LLM-pipeline north stars
        "dedup_minhash_lsh",
        "sim_search_ivf",
        "text_tfidf_topterms",
        "pipeline_corpus_curation",
        "llm_summarize",
        "mm_binary_meta",
        "join_fuzzy_topk",
        "stream_tumbling_window",
    ):
        assert flagship in first50, flagship
