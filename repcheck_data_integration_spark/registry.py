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
# Round-6 ordering rule (VERDICT.md r5 Next-round #2): the 5 ever-failed
# rows stay pinned first (never rotate a failure out of the window; the
# only other non-green rows ever recorded — agg_approx_distinct /
# agg_approx_percentile — are `no_oracle` BY DESIGN, approximate sketches
# that cannot hash-match an exact oracle, so they don't count as failures
# and stay outside). The 8 never-failed flagships drop out of the window
# this round; all 45 remaining slots are filled with the OLDEST
# never-driver-sampled oracle-backed queries in registration order (union
# of CORRECTNESS_r0{2..5}.json keys is 169 of 431; this tranche burns the
# dedup/curation/text-statistics/business-aggregate backlog from rounds
# 3-4).
DRIVER_PRIORITY: list[str] = [
    # ever-failed rows, pinned first forever (r2: tpch_q12; r3: the four):
    "win_session_features",
    "snk_scd2",
    "emb_normalize",
    "emb_quantize_int8",
    "tpch_q12_priority_counts",
    # dedup family — never driver-sampled:
    "dedup_components",
    "dedup_winnowing_pairs",
    "dedup_lsh_calibration",
    "dedup_exact_normalized",
    "dedup_url_canonical",
    "dedup_paragraphs_keep_first",
    # corpus mixing / sampling / curation — never driver-sampled:
    "sample_domain_cap",
    "mix_temperature_weights",
    "pipeline_pretrain_corpus",
    "mix_epoch_schedule",
    "sample_class_balance",
    "sample_weighted",
    "pipeline_web_corpus",
    "mix_annealing_schedule",
    "mix_token_budget_allocation",
    "corpus_data_card",
    # text analysis / quality — never driver-sampled:
    "text_fingerprint",
    "text_gopher_filter",
    "text_html_strip",
    "text_quality_logreg",
    "text_quality_quantile",
    "text_lang_jsd",
    "text_tokenizer_fertility",
    "text_distinct_ngrams",
    "text_zipf_fit",
    "text_heaps_fit",
    "text_term_burstiness",
    "text_code_detect",
    "fn_arrow_bytes_stats",
    "ml_cohen_kappa",
    # joins / business aggregates — never driver-sampled:
    "join_cidr_lookup",
    "agg_bitwise",
    "agg_corr_matrix",
    "agg_grouped_linreg",
    "agg_copurchase_pairs",
    "agg_ab_ttest",
    "agg_rfm_scores",
    "agg_pandas_api_counts",
    "agg_abc_pareto",
    "agg_gini_revenue",
    "agg_backlog_aging",
    "agg_cohort_ltv",
    "agg_order_gaps",
    "agg_market_basket_rules",
    "agg_penny_allocation",
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
