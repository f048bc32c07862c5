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
# checks the first 50 of these 126), so this list is a documented rotation
# schedule, not engine semantics.
#
# ROTATION RULE (amended round 6 — the original "no query may go two
# consecutive rounds without a fresh driver row" stopped closing
# arithmetically at 125 queries x 50 driver rows/round, which needs >=63):
#   1. Queries whose code changed since their last driver row, and queries
#      that have NEVER had a driver row, always lead the 50-prefix.
#   2. Untouched queries may age up to THREE rounds without a fresh driver
#      row PROVIDED the local 3-SF parity sweep (value-exact vs the DuckDB
#      oracle at sf0.001/0.01/0.1 — stricter than the driver's single-SF
#      hash) ran green for them that round; they fill remaining prefix
#      slots least-recently-verified first.
#   3. Rows-only queries (q16/q76/q116/q137/q141 — approximate by design,
#      their driver row can only ever say rows>0; each carries an explicit
#      accuracy gate in tests/test_sketch_gates.py or test_llm_dedup.py
#      instead) live at the PERMANENT tail and never take a prefix slot —
#      even when new or code-changed, because the row carries strictly
#      less information than the local gate that must pass anyway; in a
#      50-slot budget that slot belongs to a value-oracled query.
# This closes: <=50 changed/never-checked queries lead each round, and
# 121 value-oracled queries / 3 rounds ~= 40 <= remaining slots + head.
# tests/test_contract.py pins the schedule — and, as of round 11, derives
# the rule-2 ceiling MECHANICALLY from tools/rotation_state.json (latest
# green driver row per query, regenerated from the CORRECTNESS_r*.json
# history by tools/rotation_state.py) instead of trusting a hand-listed
# set: the r10 verdict caught the written r11 plan silently dropping
# q14/q15/q17 from the ceiling, exactly the drift a prose list invites.
#
# ROUND-11 ORDER (this round — executes the r10 plan with the verdict's
# CORRECTED ceiling):
#   1. rule 1 ledger opened EMPTY (every r10 change sat inside the r10
#      prefix). Mid-round amendments, promoted per rule 1 as their
#      changes landed:
#      - q44/q45/q123: the round-11 control-char probe found the
#        embedded-NUL sort split (DuckDB's sort-key encoding truncates
#        at U+0000 — ORDER BY/LIST_SORT/RANK tie 'k'||chr(0) with 'k' —
#        while its =/< and Spark's sort are byte-exact); q44 excludes
#        backslash-u0000 payloads from the parse contract, q45's
#        head_vocab (its one sort-valued column) is NULL for
#        NUL-bearing text on both twins, q123 gained the
#        events_props_nul_escapes rule. All three lead the prefix; the
#        last three fill entries (q92, q93, q140) yield their slots and
#        front the post-boundary tail.
#      - q110 via the round-11 word-boundary probe: Java's \b is
#        unicode-aware, RE2's is ASCII — 'é1.2.3.4é' redacted by the
#        oracle and skipped by the engine. The IPv4 rule now uses
#        explicit ASCII capture-group boundaries (no \b anywhere) with
#        two-pass detection for adjacent addresses. q110 already holds
#        a rule-2 ceiling slot in this prefix, so its fresh r11 row
#        covers the change — no rotation move.
#      - q72/q97 via the round-11 vertical-tab probe: Java's \s is
#        [ \t\n\x0B\f\r], RE2's omits \x0B — the shared
#        whitespace-collapse normalization made the dedup FINGERPRINT
#        engine-dependent for \x0B-bearing text. Both twins now spell
#        the Java class out explicitly. Both queries hold fresh r10
#        rows, so rule 1 promotes them into the prefix; the last two
#        fill entries (q74, q91) yield their slots and front the
#        post-boundary tail.
#      - q44/q123 again via the round-11 grammar-leniency probe (three
#        parsers, three grammars): single-quoted JSON killed at the
#        root (allowSingleQuotes=false on every props parse), trailing
#        garbage out of contract via the json_strict_tail depth scan
#        (Jackson parses the first value and ignores the rest), and
#        trailing commas out of contract in the REVERSE direction
#        (yyjson accepts '{"k":1,}', Jackson rejects); q123 gained the
#        events_props_trailing_garbage / _trailing_commas rules and its
#        dupkeys rule now parses props once, strictly. Both already
#        hold rule-1 prefix slots — no further rotation change.
#      - q42 via the round-11 extended rounding probe: ROUND(double, n)
#        is decimal-string HALF_UP on Spark but binary half-away on
#        DuckDB — 3-decimal inputs split the twins on 0.46% of values
#        (exhaustive sweep), and negative prices in (-0.05, 0) split on
#        the IEEE zero sign (+0.0 vs -0.0; the parity hash is
#        sign-sensitive). q42's oracle gained a LOUD 2-decimal money
#        domain guard and both twins normalize the rounded zero sign
#        (+ 0.0); the 2-decimal sweep (exhaustive over [-1000, 1000],
#        97-cent-stride sample to 200k dollars; 305k values) is clean,
#        with the [-99.99, 999.99] grid pinned permanently. q42 joins the rule-1 head; the last fill
#        entry (q73) yields its slot and fronts the post-boundary tail.
#      - q84/q102 via the round-11 extended string-cast probe:
#        TRY_CAST(VARCHAR AS INTEGER) has a different GRAMMAR per
#        engine — DuckDB leniently parses 'src1.5' -> 2 / 'src0x1F' ->
#        31 where Spark yields NULL — so their shared-SQL src_idx /
#        sampling-tier twins were silent splits on non-digit source
#        tails. Both now share strict_digit_int_sql (TRANSLATE
#        digits-only guard — itself spelled anchor-free because
#        '^[0-9]+$' twin-splits on trailing line terminators: Java's $
#        matches before a final \n, RE2's does not). Two more fill
#        entries (q62, q70) yield their slots.
#      - q40/q46 via the round-11 extended CONCAT probe: DuckDB's
#        CONCAT() SKIPS NULL arguments (Postgres-style) while Spark's
#        concat propagates NULL — and q46's spark side used concat_ws,
#        which skips the SEPARATOR with the NULL ('42' vs ':42' into
#        md5: a silent split the existing NULL-source fixture exposes).
#        Both twins now null-propagate ('||' / F.concat, declared NULL
#        metadata => NULL composite). Two more fill entries (q54, q61)
#        yield their slots.
#      - q141/q142 (fixtures now build the sketch table through the
#        manifest-versioned production path — SketchMaintenance staging
#        appends + compaction — instead of a hand-written flat layout,
#        so the rows-only driver row re-covers the real reader; both
#        are rule-3 permanent-tail queries, so no prefix slot moves).
#   2. rule 2 ceiling — MECHANICAL, 27 queries whose green rows date to
#      r8 (rotation_state.json: latest_row == 8): q14, q15, q17, q83
#      (displaced post-boundary in r10 by the rule-1 promotions), then
#      q87, q110, q112, q113, q106, q34, q35, q60, q101, q103, q105,
#      q107, q109, q114, q117, q119-q122, q125, q127-q129. All 27 take
#      prefix slots; their rows turn 3 rounds old this round.
#   3. the remaining 13 slots refresh the oldest r9-row queries in their
#      listed order: q81, q82, q130, q133-q136, q139, q31, q32, q50-q52
#      (q54/q61/q62/q70/q73/q74/q91 yielded to rule-1 promotions).
#   ---- 50-query prefix boundary ----
#   4. the displaced fill entries (q54, q61, q62, q70, q73, q74, q91,
#      q92, q93, q140) and the rest of the r9-row block (q126, q138,
#      q75, q132, q63, q88, q80, q111, q18, q19, q30, q33, q64, q65,
#      q71, q79, q86, q94, q95, q96 — 30 queries total) age to r12
#      under rule 2, backed by this round's green 3-SF parity sweep;
#      they lead the post-boundary tail so they front the r12 prefix
#      (the rule-2 ceiling there);
#   5. the queries with fresh r10 rows, in their r10 order;
#   6. permanent tail (rule 3): q16, q76, q116, q137, q141, q142.
#
# ROUND-12 ROTATION PLAN (derive, don't transcribe):
#   a. any query whose code/oracle changes in round 11 AFTER its latest
#      driver row leads (rule 1) — ledger maintained in NOTES_r11.md
#      (opens empty: every r11 change sits inside the r11 prefix);
#   b. the rule-2 ceiling is whatever `tools/rotation_state.py` reports
#      as latest_row == 9 after the r11 CORRECTNESS file lands
#      (expected: the 30 post-boundary r9-row queries of item 4 above —
#      the ten displaced fill entries plus the 20-query block);
#   c. the remaining ~20 slots refresh the oldest r10-row queries in
#      their listed order; the rest of the r10 block ages to r13 under
#      rule 2 provided the 3-SF parity sweep runs green in r12 — which
#      closes: 30 + 20 = 50 exactly.
VERIFY_ORDER: tuple[str, ...] = (
    # -- rule 1: code/oracle changed since the last driver row (the
    # -- round-11 probe waves: embedded-NUL, grammar leniency,
    # -- vertical-tab whitespace) --
    "q44_json_battery",
    "q45_array_battery",
    "q123_dq_report",
    "q72_fingerprint",
    "q97_corpus_build",
    "q42_math_battery",
    "q84_stratified_sample",
    "q102_incremental_dedup",
    "q40_string_battery",
    "q46_hash_battery",
    # -- rule 2 ceiling: r8-row untouched queries — rows turn 3 rounds
    # -- old this round, so ALL 27 take prefix slots (set derived from
    # -- tools/rotation_state.json; asserted by test_contract.py) --
    "q14_collect_pack",
    "q15_pivot",
    "q17_percentiles",
    "q83_decontamination",
    "q87_repetition",
    "q110_pii_redaction",
    "q112_cooccurrence_lift",
    "q113_length_buckets",
    "q106_user_similarity",
    "q34_window_distribution",
    "q35_window_range_frame",
    "q60_dedup_exact",
    "q101_event_funnel",
    "q103_gaps_islands",
    "q105_scalar_subquery",
    "q107_event_paths",
    "q109_retention_cohorts",
    "q114_daily_anomalies",
    "q117_scd2_intervals",
    "q119_daily_trend",
    "q120_volume_gini",
    "q121_ab_test",
    "q122_copurchase",
    "q125_user_diversity",
    "q127_audience_overlap",
    "q128_gap_fill",
    "q129_growth_curve",
    # -- rule 2 fill: oldest r9-row queries, least-recently-verified
    # -- first --
    "q81_cosine_neardup",
    "q82_ann_ivf",
    "q130_rag_chunker",
    "q133_ppjoin",
    "q134_scd2_resolve",
    "q135_daily_mad",
    "q136_interpolate",
    "q139_conversion_latency",
    "q31_window_analytic",
    "q32_window_frames",
    "q50_pandas_udf_tokenize",
    "q51_apply_in_pandas_median",
    "q52_udtf_bigrams",
    # ---- 50-query prefix boundary (driver budget) ----
    # -- displaced fill entries (yielded their slots to the rule-1
    # -- promotions) and r9-row queries aging to r12 under rule 2 (3-SF
    # -- parity sweep green this round); they front the r12 prefix --
    "q54_multimodal_decode",
    "q61_tumbling_window",
    "q62_sliding_window",
    "q70_text_stats",
    "q73_token_count_bpe",
    "q74_multimodal_meta",
    "q91_frame_sample",
    "q92_media_features",
    "q93_media_resize",
    "q140_topk_others",
    "q126_cdc_apply",
    "q138_snapshot_diff",
    "q75_neardup_jaccard",
    "q132_containment",
    "q63_session_window",
    "q88_quality_gate",
    "q80_cosine_topk",
    "q111_chunk_dedup",
    "q18_multi_distinct",
    "q19_agg_filter_clause",
    "q30_window_rank",
    "q33_topk_per_group",
    "q64_oversize_filter",
    "q65_partition_key",
    "q71_lang_id",
    "q79_vocab_topk",
    "q86_sequence_packing",
    "q94_range_join_binned",
    "q95_zorder_key",
    "q96_heavy_hitters_mg",
    # -- fresh round-10 rows, untouched since, in their r10 order
    # -- (q123/q44/q45/q72/q97 promoted to rule 1 above) --
    "q118_fuzzy_match",
    "q89_dedup_components",
    "q53_python_udf_crc",
    "q99_source_cap",
    "q100_tfidf_topterms",
    "q104_rolling_active_users",
    "q108_daily_value_bands",
    "q77_simhash",
    "q78_simhash_pairs",
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
    "q41_date_battery",
    "q43_conditional_battery",
    "q90_kmeans_train",
    "q98_srp_lsh_pairs",
    "q131_hard_negatives",
    "q85_train_split",
    "q115_dataset_mixture",
    "q124_dataset_mixture_hash",
    "q11_rollup",
    "q12_cube",
    "q66_time_rollup",
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
    "q13_grouping_sets",
    # -- rule 3: rows-only by design — permanent tail, never a prefix
    # -- slot (accuracy gates live in tests/test_sketch_gates.py and
    # -- tests/test_llm_dedup.py) --
    "q16_approx_distinct",
    "q76_neardup_minhash_lsh",
    "q116_approx_percentile",
    "q137_hll_rollup",
    "q141_sketch_table_rollup",
    "q142_sketch_incremental",
)


def all_queries() -> dict[str, Query]:
    """Registry in VERIFY_ORDER; unlisted queries (if any) append at the end
    in registration order so a missing VERIFY_ORDER entry can't hide one."""
    load_all_modules()
    ordered = {n: QUERIES[n] for n in VERIFY_ORDER if n in QUERIES}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    return ordered
