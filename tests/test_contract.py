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
        "q137_hll_rollup",
        "q16_approx_distinct",
        "q76_neardup_minhash_lsh",
    ]


def test_verify_order_is_the_registry_iteration_order():
    """VERIFY_ORDER is the single source of truth for the order external
    harnesses iterate queries(): it must be a permutation of the registry,
    and the round-5 rotation must hold — the 44 queries whose last fresh
    driver row is from round 3 lead (the rotation rule forbids two
    consecutive rounds without a fresh row), followed by six of the
    never-driver-checked late-r4 additions, so a harness that budgets a
    50-query prefix re-verifies exactly the stalest evidence first."""
    from nsq2kinesis_spark.registry import VERIFY_ORDER, all_queries

    names = list(all_queries())
    assert names == list(VERIFY_ORDER), "queries() must iterate in VERIFY_ORDER"
    assert len(set(VERIFY_ORDER)) == len(VERIFY_ORDER), "duplicates in VERIFY_ORDER"
    stale_r3 = (
        [f"q{n:02d}" for n in range(1, 18)]
        + [f"q{n}" for n in range(20, 30)]
        + [f"q{n}" for n in range(40, 47)]
        + ["q80", "q81", "q82"]
        + ["q63", "q66"]
        + ["q83", "q85", "q87", "q88", "q89"]
    )
    assert len(stale_r3) == 44
    got_head = [n.split("_")[0] for n in names[: len(stale_r3)]]
    assert sorted(got_head) == sorted(stale_r3), got_head
    assert len(names) == 125
    # The six remaining prefix slots go to late-r4 additions that have never
    # had a driver row; q115/q118 lead because their code changed in round 5
    # (hash-threshold mixture variant; pigeonhole blocking fix), so their
    # fresh rows verify the NEW code.
    assert names[44:50] == [
        "q115_dataset_mixture",
        "q118_fuzzy_match",
        "q110_pii_redaction",
        "q111_chunk_dedup",
        "q112_cooccurrence_lift",
        "q113_length_buckets",
    ]
    # Post-prefix head: q106 (round-5 fanout-bound change; its fresh r4 row
    # predates the change, local parity re-proves it) + the eight remaining
    # never-driver-checked additions — first in line for the r6 prefix.
    assert names[50:59] == [
        "q106_user_similarity",
        "q114_daily_anomalies",
        "q116_approx_percentile",
        "q117_scd2_intervals",
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
