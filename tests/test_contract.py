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
        "q142_sketch_incremental",
        "q16_approx_distinct",
        "q76_neardup_minhash_lsh",
    ]


def test_verify_order_is_the_registry_iteration_order():
    """VERIFY_ORDER is the single source of truth for the order external
    harnesses iterate queries(): it must be a permutation of the registry,
    and the round-10 rotation (amended rule, registry.py) must hold —
    code-changed queries lead the 50-prefix, untouched queries age at
    most 3 rounds backed by the local 3-SF parity sweep, and rows-only
    queries sit at the permanent tail."""
    from nsq2kinesis_spark.registry import VERIFY_ORDER, all_queries

    names = list(all_queries())
    assert names == list(VERIFY_ORDER), "queries() must iterate in VERIFY_ORDER"
    assert len(set(VERIFY_ORDER)) == len(VERIFY_ORDER), "duplicates in VERIFY_ORDER"
    assert len(names) == 127
    prefix = [n.split("_")[0] for n in names[:50]]
    # Rule 1: code changed since the last driver row — q123 (gained the
    # events_props_parse_contract DQ rule after its fresh r8 row, and
    # the events_props_dupkeys rule this round), plus the round-10
    # same-round changes: q118 (oracle domain bound now loud via
    # ERROR()), q89 (single-action convergence probe), q44 (the
    # duplicate-JSON-key parse-contract pin), and the Unicode probe's
    # three — q53 (codepoint-REVERSE contract), q72/q97 (dotted-I
    # SpecialCasing expanded before the LOWER dedup fingerprint).
    assert prefix[:7] == ["q123", "q118", "q89", "q44", "q53", "q72", "q97"]
    # Rule 2 ceiling: the 22 r7-row untouched queries — their rows turn
    # 3 rounds old at r10, so they MUST take prefix slots this round.
    aged_r7 = ["q99", "q100", "q102", "q104", "q108", "q77", "q78",
               "q20", "q21", "q22", "q23", "q24", "q25", "q26", "q27",
               "q28", "q29", "q40", "q41", "q42", "q43", "q45"]
    assert prefix[7:29] == aged_r7
    # Rule 2 fill: the 21 remaining slots refresh the oldest r8-row
    # queries in their listed order (q123 already holds a rule-1 slot;
    # q83/q14/q15/q17 yielded their slots to the rule-1 promotions and
    # front the post-boundary tail).
    assert prefix[29:50] == [
        "q90", "q98", "q131", "q85", "q115", "q124", "q11", "q12",
        "q46", "q66", "q01", "q02", "q03", "q04", "q05", "q06", "q07",
        "q08", "q09", "q10", "q13",
    ]
    # Post-boundary: the displaced fill entries then the r8-row block
    # that ages to r11 front the tail so they lead the r11 prefix
    # (rule-2 ceiling there).
    assert [n.split("_")[0] for n in names[50:58]] == [
        "q14", "q15", "q17", "q83", "q87", "q110", "q112", "q113",
    ]
    # Rule 3: rows-only queries occupy the permanent tail — never a prefix
    # slot (their driver row can only say rows>0; the pytest accuracy
    # gates carry the real evidence).
    assert [n.split("_")[0] for n in names[-6:]] == [
        "q16", "q76", "q116", "q137", "q141", "q142",
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
