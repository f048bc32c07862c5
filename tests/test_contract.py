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
    and the round-9 rotation (amended rule, registry.py) must hold —
    code-changed queries lead the 50-prefix (the r8 ledger), untouched
    queries age at most 3 rounds backed by the local 3-SF parity sweep,
    and rows-only queries sit at the permanent tail."""
    from nsq2kinesis_spark.registry import VERIFY_ORDER, all_queries

    names = list(all_queries())
    assert names == list(VERIFY_ORDER), "queries() must iterate in VERIFY_ORDER"
    assert len(set(VERIFY_ORDER)) == len(VERIFY_ORDER), "duplicates in VERIFY_ORDER"
    assert len(names) == 127
    prefix = [n.split("_")[0] for n in names[:50]]
    # Rule 1: code changed since the last driver row — the r8 ledger
    # (q81/q82: the scale-adaptive IVF centroid step changed their
    # code+oracles outside the r8 prefix) plus q118, whose oracle gained
    # the codepoint-LEVENSHTEIN remap THIS round after its fresh r8 row.
    assert prefix[:3] == ["q81", "q82", "q118"]
    # Rule 2 ceiling: the 21 r6-row untouched queries — their rows turn
    # 3 rounds old at r9, so they MUST take prefix slots this round.
    aged_r6 = ["q130", "q133", "q134", "q135", "q136", "q139", "q31",
               "q32", "q50", "q51", "q52", "q53", "q54", "q61", "q62",
               "q70", "q73", "q74", "q91", "q92", "q93"]
    assert prefix[3:24] == aged_r6
    # Rule 2 fill: the 26 remaining slots refresh the oldest r7-row
    # queries in their listed order (q81/q82 already hold rule-1 slots;
    # q89's round-9 contraction upgrade is covered by its slot here;
    # q99 yielded its slot to q118 and fronts the post-boundary tail).
    assert prefix[24:50] == [
        "q140", "q126", "q138", "q75", "q132", "q89", "q44", "q63",
        "q88", "q80", "q111", "q18", "q19", "q30", "q33", "q64", "q65",
        "q71", "q72", "q79", "q84", "q86", "q94", "q95", "q96", "q97",
    ]
    # Post-boundary: the r7-row block that ages to r10 fronts the tail so
    # it leads the r10 prefix (rule-2 ceiling there).
    assert [n.split("_")[0] for n in names[50:57]] == [
        "q99", "q100", "q102", "q104", "q108", "q77", "q78",
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
