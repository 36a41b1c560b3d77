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
# Round-9 ordering rule (VERDICT.md r8 Next-round #2, same policy since
# r6): the 5 ever-failed rows stay pinned first (never rotate a failure
# out of the window). Slot 6 re-checks agg_gini_revenue: round 9 moved
# its tie-group rank-sum product into DECIMAL(38,0) (ADVICE r8 — the
# LONG cnt*off_cnt could wrap silently at a ~1e10-customer domain), the
# one changed-formula op this round. Slots 7-8 are the two round-8 split
# ops — changed this round (their shared components subtree now rides
# ckpt.shared_components' per-session checkpoint) AND never sampled — so
# they jump the queue, followed by the rest of the VERDICT r8 gate-only
# flagships (dedup_cluster_stats, llm_hybrid_rrf, the three streaming
# batch twins, join_set_similarity, agg_percentile_exact_distributed).
# The remaining slots burn the never-driver-sampled backlog (126
# oracle-backed after r8) in registration order. Rows-only ops stay
# OUTSIDE the window (policy pinned by tests/test_entry.py: a slot spent
# on a query that can never hash-match wastes hash-verification surface;
# their correctness is their unit tests, COVERAGE.md "Rows-only
# registry"). After this window: ~82 oracle-backed never-sampled remain
# for r10+.
DRIVER_PRIORITY: list[str] = [
    # ever-failed rows, pinned first forever (r2: tpch_q12; r3: the four):
    "win_session_features",
    "snk_scd2",
    "emb_normalize",
    "emb_quantize_int8",
    "tpch_q12_priority_counts",
    # round-9 changed-op re-check (DECIMAL rank-sum accumulator):
    "agg_gini_revenue",
    # changed this round AND never driver-sampled (shared components memo):
    "split_leakage_safe",
    "dq_split_contamination",
    # VERDICT r8 gate-only flagships, never driver-sampled:
    "agg_percentile_exact_distributed",
    "dedup_cluster_stats",
    "llm_hybrid_rrf",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup_keys",
    "join_set_similarity",
    # never-sampled backlog in registration order:
    "graph_clustering_coeff",
    "graph_random_walks",
    "graph_jaccard_neighbors",
    "graph_bfs_distance",
    "graph_degree_assortativity",
    "graph_modularity",
    "graph_katz_centrality",
    "graph_ktruss",
    "graph_ppr",
    "skew_salted_agg",
    "skew_salted_join",
    "agg_kmv_sketch",
    "dq_t_closeness",
    "ts_autocorr",
    "ml_linreg_normal_eq",
    "ml_naive_bayes_lang",
    "ml_confusion_prf",
    "ml_auc_roc",
    "ml_decision_stump",
    "ts_theil_sen",
    "ts_cross_correlation",
    "rec_item_item_cosine",
    "priv_dp_counts",
    "ml_lift_gains",
    "ml_ks_statistic",
    "ml_calibration_bins",
    "ts_ses_forecast",
    "agg_theil_index",
    "agg_bootstrap_ci",
    "ts_decompose_seasonal",
    "ts_anomaly_seasonal",
    "events_entropy_rate",
    "ml_sprt_ab",
    "events_markov_stationary",
    "ml_logreg_newton",
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
