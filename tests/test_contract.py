"""Driver-contract hygiene: the exact properties the verification driver
relies on (__spark_entry__.entry/queries/oracle_sql), checked locally so a
refactor can't silently break the harness interface."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod

from .conftest import SF_SMOKE


def test_contract_shapes():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert qs, "queries() empty"
    assert set(osql) <= set(qs), "oracle_sql has keys not in queries()"
    for name in qs:
        assert re.fullmatch(r"q\d+_\w+", name), f"bad query name {name!r}"
    assert all(callable(b) for b in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
    # rows-only set is exactly the declared approximate/probabilistic ops
    assert sorted(set(qs) - set(osql)) == [
        "q116_approx_percentile",
        "q16_approx_distinct",
        "q76_neardup_minhash_lsh",
    ]


def test_verify_order_is_the_registry_iteration_order():
    """VERIFY_ORDER is the single source of truth for the order external
    harnesses iterate queries(): it must be a permutation of the registry,
    and the round-4 rotation must hold — the 24 queries whose last fresh
    correctness row is from round 2 lead, so a harness that budgets a
    50-query prefix re-verifies them before anything fresher."""
    from nsq2kinesis_spark.registry import VERIFY_ORDER, all_queries

    names = list(all_queries())
    assert names == list(VERIFY_ORDER), "queries() must iterate in VERIFY_ORDER"
    assert len(set(VERIFY_ORDER)) == len(VERIFY_ORDER), "duplicates in VERIFY_ORDER"
    stale_r2 = (
        ["q18", "q19"]
        + [f"q{n}" for n in range(30, 36)]
        + [f"q{n}" for n in range(50, 55)]
        + ["q61", "q62", "q64", "q65"]
        + [f"q{n}" for n in range(70, 75)]
        + ["q76", "q79"]
    )
    got_head = [n.split("_")[0] for n in names[: len(stale_r2)]]
    assert sorted(got_head) == sorted(stale_r2), got_head
    assert len(names) == 108
    # Queries whose code (or loader path) changed EARLY in round 4 also sit
    # inside the driver's 50-entry budget for fresh rows. Exception, by
    # design: q110-q114 were added late in round 4 after the 24 mandatory
    # r2-stale rotations + this list had consumed the whole prefix; they sit
    # immediately past the boundary (asserted below) so they lead the r5
    # prefix, with tests/test_oracle_parity.py as their round-4 evidence.
    for changed in (
        "q90_kmeans_train",  # new in round 4
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
        "q106_user_similarity",
        "q107_event_paths",
        "q108_daily_value_bands",
        "q109_retention_cohorts",
        "q75_neardup_jaccard",  # pair unpacking/join-hint rewrite (4e8be4a)
        "q77_simhash",  # packed-lane vote rewrite
        "q78_simhash_pairs",
        "q86_sequence_packing",  # shard-count knob
        "q60_dedup_exact",  # events loader NTZ cast
        "q84_stratified_sample",
    ):
        assert changed in names[:50], changed
    # the late additions lead the post-prefix region (first in line for r5)
    assert names[50:64] == [
        "q110_pii_redaction",
        "q111_chunk_dedup",
        "q112_cooccurrence_lift",
        "q113_length_buckets",
        "q114_daily_anomalies",
        "q115_dataset_mixture",
        "q116_approx_percentile",
        "q117_scd2_intervals",
        "q118_fuzzy_match",
        "q119_daily_trend",
        "q120_volume_gini",
        "q121_ab_test",
        "q122_copurchase",
        "q123_dq_report",
    ]


def test_entry_smoke(spark):
    """Mirror of the driver's smoke check: entry() runs at sf0.001 and
    yields rows with a stable schema."""
    df = entrymod.entry(spark)
    assert df.columns == [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "avg_qty",
        "avg_price",
        "avg_disc",
        "count_order",
    ]
    assert df.count() > 0


def test_builders_accept_any_sf_dir(spark):
    """Builders must take (spark, sf_dir) positionally — the driver calls
    them that way — and be independent of each other (no shared temp-view
    collisions when run in sequence)."""
    qs = entrymod.queries()
    for name in ("q01_pricing_summary", "q52_udtf_bigrams", "q66_time_rollup"):
        df = qs[name](spark, SF_SMOKE)
        assert df.count() >= 0
