"""queries()/oracle_sql() registry — the driver-contract backbone.

Every operator module registers its demo query (a ``(spark, sf_dir) ->
DataFrame`` callable) plus, when DuckDB can express the same computation, an
ANSI-SQL oracle twin. The driver compares row-count + schema + order-
insensitive value hash at sf0.01, so:

- alias every computed column identically on both sides;
- make every result deterministic (full tie-breaks on windows/top-k,
  sort_array on collected sets);
- keep floating aggregation exact by summing in DECIMAL then casting to
  DOUBLE (parallel double summation is order-dependent, decimal is not).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name``; ``oracle`` is the DuckDB SQL twin
    (omit for rows-only ops: geometry refine, UDF kernels, streaming)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver samples the FIRST 50 queries in dict order for its oracle
# compare; round 2's sample covered only TPC-H + basic filters/joins/aggs
# and left every LLM-pipeline north star "untested". This prefix front-loads
# the flagship operators (dedup, ANN, text analysis, curation pipelines,
# multimodal, streaming twins, heavy joins) so driver-visible correctness
# covers what the engine is FOR; the full local gate (tools/check.py) still
# checks all of them.
#
# Round-8 ordering rule (VERDICT.md r7 Next-round #2, same policy as r7):
# the 5 ever-failed rows stay pinned first (never rotate a failure out of
# the window; the only other non-green rows ever recorded —
# agg_approx_distinct / agg_approx_percentile — are `no_oracle` BY DESIGN
# and stay outside). Slot 6 re-checks agg_gini_revenue in the DRIVER's own
# environment: round 8 departitioned it via operators/prefix.py and its
# iw accumulator changed type long -> DECIMAL(38,0), the one changed op
# this round whose final formula mixes that new type into cross-engine
# float arithmetic (abc_pareto/copurchase also changed plans but stay
# integer-exact end-to-end and were driver-green before; both gate
# session shapes re-verify them). The remaining 44 slots burn the
# never-driver-sampled backlog (177 after r7) in registration order,
# EXCEPT (a) the two changed-this-round ops that are ALSO first-timers —
# agg_lorenz_deciles (departitioned) and dq_fk_coverage (part/customer
# parents moved off broadcast onto bucketed layouts) — which jump the
# queue, and (b) rows-only ops, which stay OUTSIDE the window (policy
# pinned by tests/test_entry.py: a window slot spent on a query that can
# never hash-match wastes hash-verification surface; their correctness
# is their unit tests, COVERAGE.md "Rows-only registry"). 133
# never-sampled remain for r9+ (125 oracle-backed + 8 rows-only).
DRIVER_PRIORITY: list[str] = [
    # ever-failed rows, pinned first forever (r2: tpch_q12; r3: the four):
    "win_session_features",
    "snk_scd2",
    "emb_normalize",
    "emb_quantize_int8",
    "tpch_q12_priority_counts",
    # round-8 changed-op re-check (new plan + new accumulator type):
    "agg_gini_revenue",
    # changed this round AND never driver-sampled:
    "agg_lorenz_deciles",
    "dq_fk_coverage",
    # text / corpus stats — never driver-sampled:
    "text_bigram_xent",
    "text_bpe_encode1",
    "text_token_count_bpe",
    "agg_heavy_hitters_exact",
    "agg_count_min_sketch",
    "text_rake_keywords",
    "corpus_report",
    "text_pmi_pairs",
    "text_keyphrase_textrank",
    "text_kneser_ney_xent",
    "text_watermark_score",
    "text_source_overlap_matrix",
    "dedup_boilerplate_sentences",
    "text_ngram_novelty",
    "dq_pii_report",
    "text_pmi_collocations",
    # LLM eval — never driver-sampled:
    "llm_eval_chrf",
    "ml_bradley_terry",
    "llm_eval_edit_rate",
    "llm_rag_eval",
    # data-quality suite — never driver-sampled:
    "dq_profile",
    "dq_constraint_check",
    "dq_histogram",
    "dq_outliers_mad",
    "sample_deterministic",
    "sample_stratified",
    "dq_distribution_shift",
    "dq_benford_digits",
    "dq_rater_agreement",
    # temporal joins — never driver-sampled:
    "ts_gap_fill",
    "join_asof_forward",
    "join_asof_tolerance",
    "ts_resample_ohlc",
    "join_interval_overlap",
    "join_asof_nearest",
    "join_pit_scd2",
    "temporal_align_segments",
    # graph family — never driver-sampled:
    "graph_degree",
    "graph_two_hop",
    "graph_triangle_count",
    "agg_reaggregate",
    "graph_label_propagation",
]


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES with the driver-priority prefix first, then the remainder in
    registration order (names in DRIVER_PRIORITY but not registered are
    ignored rather than erroring)."""
    first = [n for n in DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(first)]
    return {n: QUERIES[n] for n in [*first, *rest]}


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from .plans import tpch, tpch_more, tpch_rest, tpch_final  # noqa: F401
    from .operators import (  # noqa: F401
        filters,
        joins,
        aggregates,
        windows,
        setops,
        upsert,
        resolve,
        spatial,
        dedup,
        similarity,
        textstats,
        multimodal,
        llm,
        quality,
        temporal,
        graph,
        textops,
        skew,
        sampling,
        statsml,
        statsml2,
        statsml3,
        statsml4,
        statsml5,
        statsml6,
    )
    from .functions import scalar_queries  # noqa: F401
    from .sources import file_sources, pyds  # noqa: F401
    from .streaming import batch_windows  # noqa: F401
