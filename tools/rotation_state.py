"""Rotation ledger generator: derive each query's latest driver-row round
from the committed CORRECTNESS_r*.json history.

The r10 verdict found the hand-listed rule-2 ceiling had silently dropped
q14/q15/q17 (What's wrong #1); this tool makes the ceiling MECHANICAL.
Run after each round's CORRECTNESS file lands:

    python tools/rotation_state.py          # rewrites tools/rotation_state.json
    python tools/rotation_state.py --check  # exit 1 if the file is stale

tests/test_contract.py derives the rule-2 ceiling set from the JSON and
asserts it sits inside the 50-query prefix of registry.VERIFY_ORDER —
a hand-transcribed omission now fails the suite instead of aging a row
past the 3-round invariant.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
STATE_PATH = REPO / "tools" / "rotation_state.json"


def compute_state(max_round: int | None = None) -> dict:
    """latest driver-row round per query, from CORRECTNESS_r*.json.

    A row counts only if it verified green (rows/schema/hash all true for
    oracled queries; rows_match for rows-only ones) — a red or errored row
    is not evidence and must not reset the query's age.

    `max_round` ignores driver files newer than that round — used by the
    judging-time tripwire to check that a committed ledger was correct
    as of its own as_of_round when exactly one newer round of driver
    evidence has landed since the builder's last commit.
    """
    latest: dict[str, int] = {}
    rounds: list[int] = []
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        rounds.append(rnd)
        data = json.loads(p.read_text())
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") in (True, None)
                and row.get("hash_match") in (True, None)
                and row.get("err") in (None, "")
            )
            if green and rnd >= latest.get(name, 0):
                latest[name] = rnd
    return {
        "as_of_round": max(rounds) if rounds else 0,
        "latest_row": dict(sorted(latest.items())),
    }


ROWS_ONLY = {
    "q16_approx_distinct",
    "q76_neardup_minhash_lsh",
    "q116_approx_percentile",
    "q137_hll_rollup",
    "q141_sketch_table_rollup",
    "q142_sketch_incremental",
}


def plan_prefix(state: dict, prefix_budget: int = 50) -> dict:
    """Mechanical next-round 50-prefix from the ledger + current
    VERIFY_ORDER (the r12 verdict's stretch: make the rotation commit a
    one-liner forever).

    Rule 1 (code changed after latest row) can't be derived from the
    ledger — it's the in-round NOTES ledger's job — so this emits the
    rule-2 portion: the ceiling (rows turning exactly 3 rounds old at
    the executing round) in their current listed order, then fill slots
    from the remaining oracled queries least-recently-verified first
    (ties broken by current listed order). Rule-3 rows-only queries
    never appear.
    """
    sys.path.insert(0, str(REPO))
    from nsq2kinesis_spark.registry import VERIFY_ORDER

    executing_round = state["as_of_round"] + 1
    latest = state["latest_row"]
    pos = {n: i for i, n in enumerate(VERIFY_ORDER)}
    oracled = [n for n in VERIFY_ORDER if n not in ROWS_ONLY]
    # Mandatory set: rows AT or PAST the 3-round ceiling, plus queries
    # with no green row at all (r13 ADVICE: `== executing_round - 3`
    # silently demoted an already-overage or never-verified query to
    # truncatable fill — the exact invariant this tool exists to protect).
    ceiling = [
        n for n in oracled
        if latest.get(n) is None or latest[n] <= executing_round - 3
    ]
    rest = sorted(
        (n for n in oracled if n not in ceiling),
        key=lambda n: (latest.get(n, -1), pos[n]),
    )
    fill = rest[: max(0, prefix_budget - len(ceiling))]
    return {
        "executing_round": executing_round,
        "ceiling": ceiling,
        "fill": fill,
        "prefix": ceiling + fill,
    }


def main(argv: list[str]) -> int:
    state = compute_state()
    if "--plan" in argv:
        p = plan_prefix(state)
        print(f"# round {p['executing_round']} rule-2 prefix "
              f"({len(p['ceiling'])} ceiling + {len(p['fill'])} fill):")
        for n in p["prefix"]:
            print(f'    "{n}",')
        return 0
    text = json.dumps(state, indent=1) + "\n"
    if "--check" in argv:
        if not STATE_PATH.exists() or STATE_PATH.read_text() != text:
            print("rotation_state.json is stale — rerun tools/rotation_state.py")
            return 1
        print(f"rotation_state.json current (as_of_round={state['as_of_round']})")
        return 0
    STATE_PATH.write_text(text)
    n = len(state["latest_row"])
    print(f"wrote {STATE_PATH} — {n} queries, as_of_round={state['as_of_round']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
