"""Query registry: every engine operator ships as a named query.

Each entry couples a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (optionally) an ANSI-SQL oracle twin runnable by DuckDB over the same
parquet tables. The driver's correctness gate compares the two at sf=0.01
(row count + schema + order-insensitive value hash), so builders must:

- alias every computed column identically in both forms;
- round any double produced by arithmetic/aggregation (summation order is
  engine-dependent at the last ulp) — raw stored doubles are exact and need
  no rounding;
- stay timezone-pinned to UTC (handled by ``tables.table``).

Queries without an oracle (approximate/streaming-only ops) register with
``oracle=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder (and its oracle SQL twin)."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all_modules() -> None:
    """Import every operator module so their @query decorators run.

    Imports are alphabetical and carry no scheduling meaning; the public
    iteration order of the registry is fixed separately by VERIFY_ORDER.
    """
    from .operators import (  # noqa: F401
        aggregates,
        joins,
        llm_dedup,
        llm_pipeline,
        llm_text,
        relational,
        scalars,
        similarity,
        streaming_twins,
        udfs,
        windows,
    )


# Explicit verification priority: the order external correctness harnesses
# iterate ``queries()``. Some harnesses budget a fixed prefix (the driver
# checks the first 50 of these 108), so this list is a documented rotation
# schedule, not engine semantics. Rotation rule: no query may go two
# consecutive rounds without a fresh driver row — promote anything whose
# last fresh row is two rounds old into the head, demote the
# freshest-verified untouched modules to the tail.
#
# ROUND-5 ORDER (this round):
#   1. the 44 queries whose last fresh driver row is from round 3 — by the
#      rotation rule they MUST lead: the join suite q20-q29, the scalar
#      batteries q40-q46, the vector trio q80-q82 (q82's r4-upgraded value
#      oracle gets its first driver row here), the remaining streaming
#      twins q63/q66, the relational/aggregate core q01-q17, and the
#      r3 llm-pipeline block q83/q85/q87-q89;
#   2. six of the fourteen late-round-4 additions that have only local
#      parity evidence (never a driver row): q115 and q118 first because
#      their code changes THIS round (q118's pigeonhole blocking fix,
#      q115's hash-threshold variant), then q110-q113 in number order;
#   3. ---- 50-query prefix boundary ----
#   4. immediately past the boundary: q106 (code changes this round — the
#      hot-day fanout bound — so its fresh r4 row predates the change;
#      local parity re-proves it), then the eight remaining never-driver-
#      checked late additions (q114, q116, q117, q119-q123) and any new
#      round-5 queries, all first in line for the r6 prefix;
#   5. tail: everything with a fresh round-4 row and untouched code.
#
# ROUND-6 ROTATION PLAN (write this order at the start of r6): the r6
# prefix must take (a) the post-boundary head below — q106 + q114/q116/
# q117/q119-q123 + all new r5 queries — for first/re-verification, and
# (b) everything in today's tail whose only fresh row is r4 would become
# two rounds stale by r7, so the r4-heavy tail blocks (q18/q19, q30-q35,
# q50-q54, q61/q62/q64/q65, q70-q74/q79, q76, q60/q84/q86, q90-q105/
# q107-q109, q75/q77/q78) fill the remaining slots, least-recently-listed
# first; today's 50-prefix (fresh r5 rows) demotes to the tail.
VERIFY_ORDER: tuple[str, ...] = (
    # -- stale since round 3: join suite --
    "q20_join_inner_broadcast",
    "q21_join_shuffle_3way",
    "q22_join_left_outer",
    "q23_join_right_outer",
    "q24_join_full_outer",
    "q25_join_semi",
    "q26_join_anti",
    "q27_join_theta",
    "q28_join_asof",
    "q29_exists_subquery",
    # -- stale since round 3: scalar batteries --
    "q40_string_battery",
    "q41_date_battery",
    "q42_math_battery",
    "q43_conditional_battery",
    "q44_json_battery",
    "q45_array_battery",
    "q46_hash_battery",
    # -- stale since round 3: vector similarity (q82's upgraded value
    # -- oracle gets its FIRST driver row here) --
    "q80_cosine_topk",
    "q81_cosine_neardup",
    "q82_ann_ivf",
    # -- stale since round 3: remaining streaming twins --
    "q63_session_window",
    "q66_time_rollup",
    # -- stale since round 3: relational/aggregate core --
    "q01_pricing_summary",
    "q02_project_compute",
    "q03_filter_battery",
    "q04_sort_limit",
    "q05_union_all",
    "q06_intersect",
    "q07_except",
    "q08_distinct",
    "q09_set_ops_all",
    "q10_agg_global",
    "q11_rollup",
    "q12_cube",
    "q13_grouping_sets",
    "q14_collect_pack",
    "q15_pivot",
    "q16_approx_distinct",
    "q17_percentiles",
    # -- stale since round 3: llm-pipeline block --
    "q83_decontamination",
    "q85_train_split",
    "q87_repetition",
    "q88_quality_gate",
    "q89_dedup_components",
    # -- first driver rows; q115/q118 lead because their code changes in
    # -- round 5 (hash-threshold variant; pigeonhole blocking fix) --
    "q115_dataset_mixture",
    "q118_fuzzy_match",
    "q110_pii_redaction",
    "q111_chunk_dedup",
    "q112_cooccurrence_lift",
    "q113_length_buckets",
    # ---- 50-query prefix boundary (driver budget) ----
    # -- post-boundary head: code changed in round 5 / never driver-checked;
    # -- leads the r6 prefix per the plan above --
    "q106_user_similarity",
    "q114_daily_anomalies",
    "q116_approx_percentile",
    "q117_scd2_intervals",
    "q119_daily_trend",
    "q120_volume_gini",
    "q121_ab_test",
    "q122_copurchase",
    "q123_dq_report",
    # -- new in round 5 --
    "q124_dataset_mixture_hash",
    "q125_user_diversity",
    "q126_cdc_apply",
    "q127_audience_overlap",
    "q128_gap_fill",
    "q129_growth_curve",
    "q130_rag_chunker",
    "q131_hard_negatives",
    "q132_containment",
    "q133_ppjoin",
    "q134_scd2_resolve",
    "q135_daily_mad",
    "q136_interpolate",
    "q137_hll_rollup",
    "q138_snapshot_diff",
    "q139_conversion_latency",
    "q140_topk_others",
    # -- tail: fresh round-4 rows, code untouched in round 5 --
    "q18_multi_distinct",
    "q19_agg_filter_clause",
    "q30_window_rank",
    "q31_window_analytic",
    "q32_window_frames",
    "q33_topk_per_group",
    "q34_window_distribution",
    "q35_window_range_frame",
    "q50_pandas_udf_tokenize",
    "q51_apply_in_pandas_median",
    "q52_udtf_bigrams",
    "q53_python_udf_crc",
    "q54_multimodal_decode",
    "q61_tumbling_window",
    "q62_sliding_window",
    "q64_oversize_filter",
    "q65_partition_key",
    "q70_text_stats",
    "q71_lang_id",
    "q72_fingerprint",
    "q73_token_count_bpe",
    "q74_multimodal_meta",
    "q79_vocab_topk",
    "q76_neardup_minhash_lsh",
    "q86_sequence_packing",
    "q60_dedup_exact",
    "q84_stratified_sample",
    "q90_kmeans_train",
    "q91_frame_sample",
    "q92_media_features",
    "q93_media_resize",
    "q94_range_join_binned",
    "q95_zorder_key",
    "q96_heavy_hitters_mg",
    "q97_corpus_build",
    "q98_srp_lsh_pairs",
    "q99_source_cap",
    "q100_tfidf_topterms",
    "q101_event_funnel",
    "q102_incremental_dedup",
    "q103_gaps_islands",
    "q104_rolling_active_users",
    "q105_scalar_subquery",
    "q107_event_paths",
    "q108_daily_value_bands",
    "q109_retention_cohorts",
    "q75_neardup_jaccard",
    "q77_simhash",
    "q78_simhash_pairs",
)


def all_queries() -> dict[str, Query]:
    """Registry in VERIFY_ORDER; unlisted queries (if any) append at the end
    in registration order so a missing VERIFY_ORDER entry can't hide one."""
    load_all_modules()
    ordered = {n: QUERIES[n] for n in VERIFY_ORDER if n in QUERIES}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    return ordered
