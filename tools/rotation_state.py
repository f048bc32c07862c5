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


def compute_state() -> dict:
    """latest driver-row round per query, from CORRECTNESS_r*.json.

    A row counts only if it verified green (rows/schema/hash all true for
    oracled queries; rows_match for rows-only ones) — a red or errored row
    is not evidence and must not reset the query's age.
    """
    latest: dict[str, int] = {}
    rounds: list[int] = []
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
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


def main(argv: list[str]) -> int:
    state = compute_state()
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
