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
from dataclasses import dataclass, field

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
# checks the first 50 of these 74), so this list is a documented rotation
# schedule, not engine semantics:
#
#   1. least-recently-verified queries first — q20-q29 and q40-q46 last got
#      fresh oracle rows in round 1 (they fell outside round 2's prefix);
#   2. then queries whose implementation changed this round (similarity:
#      q81 re-keyed to centroid-cell blocking in round 3, plus its module
#      peers q80/q82);
#   3. then the remaining surface; the tail holds queries with the freshest
#      green rows AND untouched code this round (windows, udfs, llm_text —
#      all fresh-green in round 2, unchanged in round 3).
#
# Rotation rule for future rounds: no query may go two consecutive rounds
# without a fresh row — promote anything whose last fresh row is two rounds
# old into the head, demote the freshest-verified untouched modules to the
# tail. tests/test_contract.py asserts this list is a permutation of the
# registry and that the stale-rotation prefix holds.
VERIFY_ORDER: tuple[str, ...] = (
    # -- stale since round 1: joins --
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
    # -- stale since round 1: scalar batteries --
    "q40_string_battery",
    "q41_date_battery",
    "q42_math_battery",
    "q43_conditional_battery",
    "q44_json_battery",
    "q45_array_battery",
    "q46_hash_battery",
    # -- code changed in round 3: similarity (q81 re-key) --
    "q80_cosine_topk",
    "q81_cosine_neardup",
    "q82_ann_ivf",
    # -- remaining prefix: relational + aggregates --
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
    # -- remaining prefix: streaming twins + llm dedup --
    "q60_dedup_exact",
    "q63_session_window",
    "q66_time_rollup",
    "q75_neardup_jaccard",
    "q77_simhash",
    "q78_simhash_pairs",
    # -- new in round 3: must be in the prefix for first oracle rows --
    "q89_dedup_components",
    "q83_decontamination",
    "q84_stratified_sample",
    "q85_train_split",
    "q86_sequence_packing",
    "q87_repetition",
    "q88_quality_gate",
    # ---- 50-query prefix boundary (driver budget) ----
    # -- tail: fresh round-2 rows, code untouched in round 3. q18/q19,
    # -- q61/q62/q64/q65, and q76 (rows-only; its recall gate runs in
    # -- tests regardless) were displaced by the seven new queries —
    # -- promote them in round 4.
    "q18_multi_distinct",
    "q19_agg_filter_clause",
    "q76_neardup_minhash_lsh",
    "q61_tumbling_window",
    "q62_sliding_window",
    "q64_oversize_filter",
    "q65_partition_key",
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
    "q70_text_stats",
    "q71_lang_id",
    "q72_fingerprint",
    "q73_token_count_bpe",
    "q74_multimodal_meta",
    "q79_vocab_topk",
)


def all_queries() -> dict[str, Query]:
    """Registry in VERIFY_ORDER; unlisted queries (if any) append at the end
    in registration order so a missing VERIFY_ORDER entry can't hide one."""
    load_all_modules()
    ordered = {n: QUERIES[n] for n in VERIFY_ORDER if n in QUERIES}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    return ordered
