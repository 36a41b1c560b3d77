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
# Round-4 ordering rule (VERDICT.md r3 §process): queries FIXED in response
# to a driver failure lead the prefix so the fix is driver-visible the same
# round, followed by rows the driver has never green-lit (tpch_q12's r2
# hash fix, the approx aggs that rotated out unverified) — never rotate a
# failure out of the window.
DRIVER_PRIORITY: list[str] = [
    # r3 failures, fixed this round (never rotate a failure out):
    "win_session_features",
    "snk_scd2",
    "emb_normalize",
    "emb_quantize_int8",
    # r2 rows whose fixes/first-runs were never driver-verified:
    "tpch_q12_priority_counts",
    "agg_approx_distinct",
    "agg_approx_percentile",
    # LLM-pipeline north stars (r3-driver-green but contract-pinned by
    # tests/test_entry.py — they stay in every window):
    "dedup_minhash_lsh",
    "sim_search_ivf",
    "text_tfidf_topterms",
    "pipeline_corpus_curation",
    "llm_summarize",
    "mm_binary_meta",
    "join_fuzzy_topk",
    "stream_tumbling_window",
    # round-4 ops the driver has NEVER sampled (the r3-green rows they
    # displace remain covered by the full local gate):
    "text_bm25_search",
    "dedup_semantic_contamination",
    "llm_preference_pairs",
    "events_attribution_linear",
    "dq_k_anonymity",
    "dq_l_diversity",
    "graph_adamic_adar",
    "text_minhash_containment",
    "join_bloom_prune",
    "llm_eval_bleu",
    "text_classifier_score",
    "text_perplexity_buckets",
    "pipeline_corpus_curation_v3",
    "agg_quantile_histogram",
    "mm_audio_energy",
    "src_avro_scan",
    "stream_dedup_minhash",
    "llm_eval_rouge",
    "events_kaplan_meier",
    "pipeline_dpo_prep",
    "events_chi2_independence",
    "text_lang_id_eval",
    "mix_excess_loss_weights",
    "ml_knn_classify",
    "llm_sft_format",
    "resolve_fs_score",
    "pipeline_rag_index",
    "pipeline_rag_query",
    "src_xml_scan",
    # round-4 continuation tranche (HITS ranking, DSIR reweighting,
    # Lee-et-al repeated-span audit — newest code gets driver eyes):
    "graph_hits",
    "text_dsir_weights",
    "dedup_repeated_ngrams",
    "graph_kcore",
    "text_readability",
    "ts_holt_linear",
    "ts_decompose_seasonal",
    "text_tokenizer_fertility",
    "dq_fk_coverage",
    "events_regularity_score",
    "win_hampel_filter",
    "sim_search_mips",
    "events_late_data_audit",
    "mix_annealing_schedule",
    "src_parquet_metadata",
    "text_keyphrase_textrank",
    "agg_market_basket_rules",
    "ts_anomaly_seasonal",
    "events_entropy_rate",
    "text_distinct_ngrams",
    "join_spatial_area_weight",
    "ml_sprt_ab",
    "events_markov_stationary",
    # round-4 causal/one-step-ML tranche (past the driver's 50-query
    # window; covered by the full local gate):
    "ml_logreg_newton",
    "agg_cuped",
    "ts_granger_causality",
    "ts_changepoint_binseg",
    "rec_slope_one",
    "text_zipf_fit",
    "graph_bfs_distance",
    # round-4 rank-statistics/concentration tranche:
    "ml_spearman_corr",
    "ml_mann_whitney_u",
    "agg_anova_oneway",
    "agg_hhi_concentration",
    "graph_degree_assortativity",
    # round-4 corpus-growth/eval tranche:
    "text_heaps_fit",
    "text_term_burstiness",
    "llm_eval_chrf",
    "ts_ljung_box",
    "ml_boosted_stumps",
    "ts_pacf",
    "graph_modularity",
    "ml_kendall_tau",
    "win_drawdown",
    "text_code_detect",
    "ml_auc_pr",
    "ml_cohen_kappa",
    "agg_trimmed_mean",
    "text_kneser_ney_xent",
    "ts_dominant_period",
    "agg_lorenz_deciles",
    "src_fixed_width_scan",
    "ts_adf_test",
    "ml_two_proportion_ztest",
    "graph_katz_centrality",
    "ml_lasso_cd",
    "ml_mcnemar_test",
    "ml_brier_decomposition",
    "ts_dow_profile",
    "events_gesd_outliers",
    "src_zip_archive_scan",
    "priv_randomized_response",
    "emb_pair_cosine_histogram",
    "events_logrank_test",
    "ts_seasonal_strength",
    "ml_cmh_test",
    "text_watermark_score",
    "text_source_overlap_matrix",
    "graph_ktruss",
    "events_growth_accounting",
    "win_max_concurrency",
    "agg_penny_allocation",
    "snk_cdc_delta",
    "agg_delta_method_ratio",
    "resolve_survivorship",
    "join_phonetic_block",
    # round-4 statsml tranche (the two names past position 50 stay under
    # the full local gate; nothing here has ever driver-failed):
    "agg_kmv_sketch",
    "dq_t_closeness",
    "join_set_similarity",
    "ts_autocorr",
    "ml_linreg_normal_eq",
    "ml_naive_bayes_lang",
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
    )
    from .functions import scalar_queries  # noqa: F401
    from .sources import file_sources, pyds  # noqa: F401
    from .streaming import batch_windows  # noqa: F401
