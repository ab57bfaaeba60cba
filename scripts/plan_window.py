"""Derive the NEXT round's 50-name CORRECTNESS window from the driver's
committed snapshots and the registry — the rotation plan, computed
instead of hand-listed (two rounds slipped on the hand-written ritual).

    python scripts/plan_window.py            # assumes next snapshot = max+1

Priority order (the policy tests/test_window_rotation.py enforces):
1. never-attested queries, in ``_ROLLOVER`` order then registration
   order (they have no green row at all);
2. queries whose latest green row falls OUTSIDE the freshness bar at
   the round AFTER next (they'd go stale if skipped), oldest first,
   alphabetical within a round;
3. remaining slots: the next-oldest fresh attestations (pre-empting the
   following round's pressure), alphabetical within a round.

Prints the exact ``_WINDOW`` list literal plus the leftover names that
must sit in ``_ROLLOVER``.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW_SIZE = 50
FRESHNESS_ROUNDS = 3  # keep in sync with tests/test_window_rotation.py
_ROWS_ONLY = {"distinct_approx"}


def ledger(repo: str) -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    max_round = 0
    try:
        out = subprocess.run(
            ["git", "-C", repo, "ls-files", "--", "CORRECTNESS_r*.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        files = sorted(os.path.join(repo, f) for f in out.splitlines() if f)
    except (OSError, subprocess.SubprocessError):
        files = sorted(
            os.path.join(repo, f)
            for f in os.listdir(repo)
            if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
        )
    for f in files:
        rnd = int(re.search(r"r(\d+)\.json", f).group(1))
        max_round = max(max_round, rnd)
        for name, row in json.loads(open(f).read()).items():
            if not isinstance(row, dict):
                continue
            if name in _ROWS_ONLY:
                green = row.get("spark_rows") is not None and row.get("err") in (
                    None,
                    "no_oracle",
                )
            else:
                green = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and not row.get("err")
                )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from mqtt2clickhouse_spark.queries import QUERIES, _ROLLOVER, _WINDOW

    latest, max_round = ledger(repo)
    # the round being planned: the driver will write max_round+1 for the
    # CURRENT _WINDOW; this plan is for the round after that
    plan_round = max_round + 2

    never = [n for n in _ROLLOVER if n not in latest]
    never += [
        n
        for n in QUERIES
        if n not in latest and n not in never and n not in _WINDOW
    ]
    # current _WINDOW names get a green row in snapshot max_round+1,
    # so at plan_round their age is 1 — always fresh; exclude them.
    candidates = sorted(
        (
            (latest[n], n)
            for n in QUERIES
            if n not in _WINDOW and n in latest
        ),
    )
    # stale during plan_round's own ledger check: with snapshot
    # plan_round-1 committed, current_round == plan_round and the bar is
    # plan_round - FRESHNESS_ROUNDS
    must = [n for rnd, n in candidates if rnd < plan_round - FRESHNESS_ROUNDS]
    rest = [n for _rnd, n in candidates if n not in must]

    window = (never + must + rest)[:WINDOW_SIZE]
    leftover = [n for n in never + must if n not in window]
    print(f"# plan for round r{plan_round:02d} "
          f"(latest committed snapshot: r{max_round:02d})")
    print(f"# never-attested: {len(never)}, stale-if-skipped: {len(must)}")
    print("_WINDOW = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    if leftover:
        print("# MUST roll over (did not fit):")
        print("_ROLLOVER =", json.dumps(leftover, indent=4))
    else:
        print("# rollover required: none (fill came from fresh names)")


if __name__ == "__main__":
    main()
