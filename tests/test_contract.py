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
        "q141_sketch_table_rollup",
        "q16_approx_distinct",
        "q76_neardup_minhash_lsh",
    ]


def test_verify_order_is_the_registry_iteration_order():
    """VERIFY_ORDER is the single source of truth for the order external
    harnesses iterate queries(): it must be a permutation of the registry,
    and the round-6 rotation (amended rule, registry.py) must hold —
    code-changed and never-driver-checked queries lead the 50-prefix,
    untouched queries age at most 3 rounds backed by the local 3-SF parity
    sweep, and rows-only queries sit at the permanent tail."""
    from nsq2kinesis_spark.registry import VERIFY_ORDER, all_queries

    names = list(all_queries())
    assert names == list(VERIFY_ORDER), "queries() must iterate in VERIFY_ORDER"
    assert len(set(VERIFY_ORDER)) == len(VERIFY_ORDER), "duplicates in VERIFY_ORDER"
    assert len(names) == 126
    prefix = [n.split("_")[0] for n in names[:50]]
    # Rule 1a: the 10 queries code-touched in round 5 after their last
    # fresh driver row lead, q106 (the salted-self-join rewrite) first.
    touched_r5 = ["q106", "q34", "q35", "q60", "q75",
                  "q101", "q103", "q105", "q107", "q109"]
    assert prefix[:10] == touched_r5
    # Rule 1b: every value-oracled query that has never had a driver row is
    # inside the prefix (q116/q137 are rows-only and excluded by rule 3).
    never_checked = (
        ["q114", "q117", "q119", "q120", "q121", "q122", "q123"]
        + [f"q{n}" for n in range(124, 137)]
        + ["q138", "q139", "q140"]
    )
    assert prefix[10:33] == never_checked
    # Rules 1+2 coinciding: the remaining slots go to r4-row queries that
    # were ALSO code-touched during round 6 (window NULLS LAST pins,
    # NULL-safe UDFs, NULL/multibyte payload contracts, declared-dimension
    # guards) — each fresh row verifies both the aged evidence and the new
    # code. The r4-row UNTOUCHED queries lead the post-boundary tail so
    # they front the r7 prefix before turning 3 rounds stale.
    assert prefix[33:50] == [
        "q31", "q32", "q50", "q51", "q52", "q53", "q54", "q61", "q62",
        "q70", "q73", "q74", "q90", "q91", "q92", "q93", "q98",
    ]
    assert [n.split("_")[0] for n in names[50:57]] == [
        "q18", "q19", "q30", "q33", "q64", "q65", "q71",
    ]
    # Rule 3: rows-only queries occupy the permanent tail — never a prefix
    # slot (their driver row can only say rows>0; the pytest accuracy
    # gates carry the real evidence).
    assert [n.split("_")[0] for n in names[-5:]] == [
        "q16", "q76", "q116", "q137", "q141",
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
