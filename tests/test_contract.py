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
    and the rotation rule (registry.py) must hold — code-changed queries
    lead the 50-prefix, untouched queries age at most 3 rounds backed by
    the local 3-SF parity sweep, and rows-only queries sit at the
    permanent tail."""
    from nsq2kinesis_spark.registry import VERIFY_ORDER, all_queries

    names = list(all_queries())
    assert names == list(VERIFY_ORDER), "queries() must iterate in VERIFY_ORDER"
    assert len(set(VERIFY_ORDER)) == len(VERIFY_ORDER), "duplicates in VERIFY_ORDER"
    assert len(names) == 127
    prefix = [n.split("_")[0] for n in names[:50]]
    # Rule 1: q106's code changed in round 14 after its r13 driver row
    # (user_day_profile/profile_norms extraction, shared with the new ANN
    # lane — NOTES_r14.md ledger), so it leads the prefix.
    # Rule 2 ceiling: the 21 r11-row untouched queries — rows turn 3
    # rounds old at r14, so ALL must take prefix slots. The set itself
    # is asserted MECHANICALLY by test_rotation_ceiling_is_mechanical
    # below; here we pin the written order.
    assert prefix[:22] == [
        "q106",
        "q117", "q119", "q120", "q121", "q122", "q125", "q127", "q128",
        "q129", "q81", "q130", "q133", "q134", "q135", "q136", "q139",
        "q31", "q32", "q50", "q51", "q52",
    ]
    # Rule 2 fill: the remaining slots refresh the oldest r12-row
    # queries in their r12 order (q94, the original last fill entry,
    # was displaced post-boundary by the rule-1 promotion).
    assert prefix[22:50] == [
        "q82", "q54", "q61", "q62", "q70", "q73", "q74", "q91", "q92",
        "q93", "q140", "q126", "q138", "q75", "q132", "q63", "q88",
        "q80", "q111", "q18", "q19", "q30", "q33", "q64", "q65", "q71",
        "q79", "q86",
    ]
    # Post-boundary: the rest of the r12-row block ages to r15 under
    # rule 2, fronting the tail so it leads the r15 prefix (the rule-2
    # ceiling there); q94 rejoins it in r12 order.
    assert [n.split("_")[0] for n in names[50:60]] == [
        "q94", "q95", "q96", "q118", "q89", "q53", "q99", "q100", "q104",
        "q108",
    ]
    # Rule 3: rows-only queries occupy the permanent tail — never a prefix
    # slot (their driver row can only say rows>0; the pytest accuracy
    # gates carry the real evidence).
    assert [n.split("_")[0] for n in names[-6:]] == [
        "q16", "q76", "q116", "q137", "q141", "q142",
    ]


def test_rotation_ceiling_is_mechanical():
    """Derive the rule-2 ceiling from the committed CORRECTNESS history
    instead of trusting a hand-listed set (the r10 verdict caught the
    written r11 plan silently dropping q14/q15/q17 — this test would
    have failed on that omission).

    Invariants asserted against tools/rotation_state.json (regenerated
    here from the CORRECTNESS_r*.json files so a stale committed ledger
    can't mask drift):
      * every oracled query whose latest green driver row is >= 3 rounds
        old at the round being executed sits INSIDE the 50-query prefix;
      * no oracled query's latest row is OLDER than 3 rounds (the
        invariant itself never broke);
      * rows-only queries never hold a prefix slot (rule 3).
    """
    from nsq2kinesis_spark.registry import VERIFY_ORDER
    from tools.rotation_state import STATE_PATH, compute_state

    state = compute_state()
    import json

    assert STATE_PATH.exists(), "run tools/rotation_state.py"
    committed = json.loads(STATE_PATH.read_text())
    if committed != state:
        # The ONE expected judging-time state (r13 verdict stretch): the
        # driver drops CORRECTNESS_r{N+1}.json after the builder's last
        # commit, every round, by construction. Accept exactly that —
        # committed ledger correct as of its own as_of_round, plus
        # exactly one newer round of driver evidence on disk. Anything
        # else (stale ledger, skipped regeneration, >1 round of drift)
        # still trips.
        assert state["as_of_round"] == committed["as_of_round"] + 1, (
            "tools/rotation_state.json is stale — rerun tools/rotation_state.py"
        )
        assert compute_state(max_round=committed["as_of_round"]) == committed, (
            "tools/rotation_state.json does not match the CORRECTNESS history "
            "up to its own as_of_round — rerun tools/rotation_state.py"
        )
        # The new round's evidence must not leave any oracled row past
        # the ceiling either (checked below with the FRESH state); the
        # prefix check stays pinned to the committed round, whose
        # rotation VERIFY_ORDER encodes.
        state = {
            "as_of_round": committed["as_of_round"],
            "latest_row": state["latest_row"],
        }

    executing_round = state["as_of_round"] + 1
    latest = state["latest_row"]
    rows_only = {
        "q16_approx_distinct",
        "q76_neardup_minhash_lsh",
        "q116_approx_percentile",
        "q137_hll_rollup",
        "q141_sketch_table_rollup",
        "q142_sketch_incremental",
    }
    # Every oracled query has SOME green row, and none is already past
    # the ceiling (older than 3 rounds when this rotation was written).
    oracled = [n for n in VERIFY_ORDER if n not in rows_only]
    missing = [n for n in oracled if n not in latest]
    assert not missing, f"oracled queries with no green driver row: {missing}"
    too_old = {n: r for n, r in latest.items() if r < executing_round - 3}
    assert not too_old, f"rows older than the 3-round ceiling: {too_old}"
    # The ceiling set (rows turning exactly 3 rounds old this round)
    # must sit inside the 50-query prefix.
    ceiling = {n for n, r in latest.items() if r == executing_round - 3}
    prefix = set(VERIFY_ORDER[:50])
    dropped = sorted(ceiling - prefix)
    assert not dropped, f"rule-2 ceiling queries missing from the prefix: {dropped}"
    # Rule 3: rows-only queries never take a prefix slot.
    assert not (rows_only & prefix), "rows-only query holds a prefix slot"


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


def test_rotation_tool_ceiling_and_drift_rules(tmp_path, monkeypatch):
    """Unit-pin the two r13-ordered rotation_state.py behaviors:

    * plan_prefix treats OVERAGE (latest < executing-3) and NEVER-VERIFIED
      oracled queries as mandatory ceiling, not truncatable fill (r13
      ADVICE: `== executing-3` silently demoted them);
    * compute_state(max_round=) ignores newer driver files — the basis of
      the tripwire's accepted one-new-round judging-time state.
    """
    import json

    import tools.rotation_state as rs

    monkeypatch.setattr(rs, "REPO", tmp_path)
    (tmp_path / "CORRECTNESS_r1.json").write_text(json.dumps({
        "q01_pricing_summary": {"rows_match": True, "schema_match": True,
                                "hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r4.json").write_text(json.dumps({
        "q02_project_compute": {"rows_match": True, "schema_match": True,
                                "hash_match": True, "err": None},
        # red row: must NOT count as evidence
        "q01_pricing_summary": {"rows_match": False, "schema_match": True,
                                "hash_match": False, "err": None},
    }))
    state = rs.compute_state()
    assert state == {"as_of_round": 4,
                     "latest_row": {"q01_pricing_summary": 1,
                                    "q02_project_compute": 4}}
    assert rs.compute_state(max_round=1) == {
        "as_of_round": 1, "latest_row": {"q01_pricing_summary": 1}}

    # plan for executing round 5: q01's row (r1) is OVERAGE (< 5-3=2) and
    # every other oracled query is never-verified — all must be ceiling.
    plan = rs.plan_prefix(state)
    assert plan["executing_round"] == 5
    assert "q01_pricing_summary" in plan["ceiling"]
    from nsq2kinesis_spark.registry import VERIFY_ORDER

    n_oracled = len([n for n in VERIFY_ORDER if n not in rs.ROWS_ONLY])
    assert len(plan["ceiling"]) == n_oracled - 1  # all but fresh q02
    # the 50-slot budget cannot truncate mandatory queries out: the whole
    # ceiling stays in the prefix even past the budget; only FILL shrinks
    # (here to zero — fresh q02 is the one non-mandatory query).
    assert plan["fill"] == []
    assert plan["prefix"] == plan["ceiling"]
