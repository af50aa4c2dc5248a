"""Central query registry: one entry per implemented operator/capability.

Each :class:`QuerySpec` pairs
  * ``spark`` — a callable ``(spark, sf_dir) -> DataFrame`` built with
    the DataFrame API (Spark-first; Catalyst picks physical strategy),
  * ``oracle`` — the equivalent ANSI SQL runnable by DuckDB on the same
    parquet tables (or ``None`` for genuinely non-SQL-expressible ops,
    which the driver checks rows-only).

Column-name discipline: every computed column is aliased identically on
both sides, because the correctness gate sorts columns by name before
hashing values.

Float discipline: floating-point aggregates are rounded (usually to 2
decimals) on BOTH sides so that summation-order differences between
Spark's partial aggregation and DuckDB never flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str
    doc: str
    spark: SparkQuery
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    category: str,
    doc: str = "",
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a Spark query + its DuckDB oracle."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            category=category,
            doc=doc or (fn.__doc__ or ""),
            spark=fn,
            oracle=oracle,
            tags=tags,
        )
        return fn

    return wrap


# Names that already have a green hash-match row in a driver CORRECTNESS
# artifact (round 1 truncated at the first 50 registry entries, so ordering
# decides who gets driver-side evidence).  We rotate: queries WITHOUT a green
# driver row yet are emitted first, verified ones last.  Update this set from
# CORRECTNESS_r{N}.json each round.
_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        # round 1 (CORRECTNESS_r01.json): 46 hash-green + 4 rows-only
        "events_funnel", "events_pivot_type_counts", "events_retention_cohorts",
        "dedup_exact", "dedup_fingerprint", "dedup_minhash_pairs", "dedup_simhash",
        "sim_cosine_topk", "sim_lsh_bucket_topk", "sim_near_dup_pairs",
        "dedup_semantic", "text_metrics", "text_quality_langid", "text_pii_stats",
        "text_repetition_signals", "text_contamination", "text_tfidf_topk",
        "text_chunk_overlap", "multimodal_binary_meta", "events_sessionize",
        "events_tumbling_window", "dedup_ngram_jaccard", "text_bpe_token_count",
        # pack_sequences / agg_approx_distinct / agg_approx_percentile /
        # sim_ivf_topk are deliberately NOT listed although r01 ran them:
        # their r01 rows are "no_oracle" and they have real oracles now —
        # re-queue them so the driver upgrades those rows to hash-green
        "dedup_apply", "sample_hash_split",
        "sample_deterministic_rows", "sample_mixture", "sample_global_shuffle",
        "text_unigram_logprob", "text_term_topk", "dedup_components",
        "dedup_apply_neardup", "pipeline_corpus_prep", "sample_stratified_topk",
        "fn_string_basic", "fn_string_regex", "fn_math", "fn_datetime", "fn_json",
        "fn_conditional", "fn_cast", "fn_tajo_registry", "fn_similar_to_dialect",
        "fn_to_char_pg_formats", "fn_string_math_extended", "join_inner_hash",
        # round 2 (CORRECTNESS_r02.json): 50/50 hash-green, including the 4
        # former rows-only queries upgraded to hash-green
        "pack_sequences", "agg_approx_distinct", "agg_approx_percentile",
        "sim_ivf_topk", "join_left_outer", "join_right_outer", "join_full_outer",
        "join_cross", "join_left_semi", "join_left_anti", "join_right_semi",
        "join_right_anti", "join_non_equi", "join_skew_salted",
        "agg_global", "agg_having", "agg_stats", "agg_string_agg",
        "agg_percentiles", "agg_distinct_multi", "agg_cube", "agg_rollup",
        "agg_grouping_sets", "micro_groupby1", "micro_groupby2",
        "sort_global", "sort_nulls_topk",
        "setop_union_all", "setop_union_distinct", "setop_intersect",
        "setop_intersect_all", "setop_except", "setop_except_all",
        "subq_in", "subq_not_in", "subq_exists_correlated", "subq_scalar",
        "subq_from_derived", "subq_cte_chain",
        "window_ranking", "window_lag_lead", "window_first_last",
        "window_ntile_frames", "window_running_agg", "window_topk_per_group",
        "nested_project", "nested_group_by", "nested_join_key",
        "asof_join_events_orders", "range_join_event_burst",
    }
)

# Among the not-yet-verified queries, small categories first so they fit
# inside the driver's per-round query cap (round 1 truncated at 50);
# self-staging scan round-trips and the 22 TPC-H bodies go last within
# the unverified block (they rotate in over subsequent rounds).
_CATEGORY_RANK = {
    "window": 1,
    "micro": 2,
    "scan": 3,
    "tpch": 4,
    "skew": 5,
    # round-2+ additions queue BEHIND the round-1 backlog: the driver
    # cap should clear §2.3–§2.7 / TPC-H first (VERDICT.md next-round #1)
    "curation": 6,
}


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules exactly once.
    from tajo_spark.queries import (  # noqa: F401
        analytics_q,
        datapipe,
        functions_q,
        relational,
        sources_q,
        temporal_q,
        tpch,
        windows_q,
    )

    order = list(REGISTRY)
    ranked = sorted(
        range(len(order)),
        key=lambda i: (
            order[i] in _DRIVER_VERIFIED,
            _CATEGORY_RANK.get(REGISTRY[order[i]].category, 0),
            i,
        ),
    )
    return {order[i]: REGISTRY[order[i]] for i in ranked}
