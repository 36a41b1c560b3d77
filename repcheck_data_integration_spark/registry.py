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
# Round-7 ordering rule (VERDICT.md r6 Next-round #2): the 5 ever-failed
# rows stay pinned first (never rotate a failure out of the window; the
# only other non-green rows ever recorded — agg_approx_distinct /
# agg_approx_percentile — are `no_oracle` BY DESIGN, approximate sketches
# that cannot hash-match an exact oracle, so they don't count as failures
# and stay outside). Slot 6 re-checks agg_rfm_scores in the DRIVER's own
# environment because round 7 changed BOTH its plan (global ntile ->
# broadcast percentile boundaries) and its oracle — the one changed op
# whose parity rests on cross-engine float interpolation rather than pure
# integer arithmetic. The remaining 44 slots burn the never-driver-sampled
# backlog in registration order (union of CORRECTNESS_r0{2..6}.json keys
# is 214 of 435; this tranche covers the window/embedding/ANN/multimodal/
# LLM-ingest families from rounds 3-4, leaving ~167 after r7).
DRIVER_PRIORITY: list[str] = [
    # ever-failed rows, pinned first forever (r2: tpch_q12; r3: the four):
    "win_session_features",
    "snk_scd2",
    "emb_normalize",
    "emb_quantize_int8",
    "tpch_q12_priority_counts",
    # round-7 changed-op re-check (new plan + new oracle):
    "agg_rfm_scores",
    # windows / set ops / CDC — never driver-sampled:
    "win_asof_last",
    "win_distribution",
    "win_moving_avg",
    "win_ewma_trailing",
    "win_drawdown",
    "win_max_concurrency",
    "set_distinct",
    "snk_cdc_delta",
    # fuzzy / phonetic / spatial joins — never driver-sampled:
    "join_fuzzy_multipass",
    "resolve_survivorship",
    "join_phonetic_block",
    "fn_zorder_key",
    "join_spatial_area_weight",
    # embeddings / ANN / semantic dedup — never driver-sampled:
    "sim_search_dot_norm",
    "emb_random_projection",
    "sim_search_recall_report",
    "emb_matryoshka_truncate",
    "ml_pca_power_iteration",
    "emb_quantile_normalize",
    "sim_search_range",
    "emb_dim_stats",
    "sim_search_mips",
    "dedup_embedding_pairs",
    "dedup_embedding_pairs_capped",
    "dedup_embedding_pairs_star",
    "emb_outlier_zscore",
    "llm_mmr_select",
    # multimodal — never driver-sampled:
    "mm_frame_sample",
    "mm_decode_stub",
    "mm_resize_stub",
    "mm_phash_bands",
    "mm_scene_cuts",
    # LLM ingest / text chunking — never driver-sampled:
    "llm_dedup_minhash",
    "llm_sim_search",
    "llm_text_stats",
    "llm_pdf_extract",
    "text_feature_hash",
    "text_chunk_windows",
    "pipeline_llm_ingest",
    "text_chunk_tokens",
    "text_sentence_split",
    "fn_udtf_sentences",
    "text_boilerplate_lines",
    "text_bpe_pair_counts",
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
