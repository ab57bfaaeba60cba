"""Derive the NEXT round's 50-name CORRECTNESS window from the driver's
committed snapshots and the registry — the rotation plan, computed
instead of hand-listed (two rounds slipped on the hand-written ritual).

    python scripts/plan_window.py            # auto-detects timing

Priority order (the policy tests/test_window_rotation.py enforces):
0. queries whose row in the LATEST committed snapshot is red — a fix
   needs immediate re-attestation (the graph_modularity r7 lesson:
   the old planner assumed every in-window name comes back green and
   silently dropped the one that didn't);
1. never-attested queries, in ``_ROLLOVER`` order then registration
   order (they have no green row at all);
2. queries whose latest green row falls OUTSIDE the freshness bar at
   the planned round (they'd go stale if skipped), oldest first,
   alphabetical within a round;
3. remaining slots: the next-oldest fresh attestations (pre-empting the
   following round's pressure), alphabetical within a round.

Timing: if the latest committed snapshot already covers the current
``_WINDOW`` (round open, snapshot landed), in-window names are judged
by their ACTUAL rows and the plan targets max_round+1; otherwise
(end of round, snapshot not yet written) the current window is
optimistically assumed green-in-max_round+1 and the plan targets
max_round+2.

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
# queries whose driver check is rows-only (no oracle).  Empty since r9:
# distinct_approx gained a calibration oracle (VERDICT r8 ask #3), so its
# historic `err: no_oracle` rows no longer count green and it re-enters
# the rotation as never-attested — by design, it needs a fresh full row.
_ROWS_ONLY: set[str] = set()


def _row_green(name: str, row: dict) -> bool:
    if name in _ROWS_ONLY:
        return row.get("spark_rows") is not None and row.get("err") in (
            None,
            "no_oracle",
        )
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def ledger(repo: str) -> tuple[dict[str, int], int, set[str], set[str]]:
    """Returns (name -> latest GREEN round, max committed round,
    names with ANY row in the max-round snapshot, names whose
    max-round row is RED)."""
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
    last_names: set[str] = set()
    last_red: set[str] = set()
    for f in files:
        rnd = int(re.search(r"r(\d+)\.json", f).group(1))
        rows = {
            n: r
            for n, r in json.loads(open(f).read()).items()
            if isinstance(r, dict)
        }
        if rnd > max_round:
            max_round = rnd
            last_names = set(rows)
            last_red = {n for n, r in rows.items() if not _row_green(n, r)}
        for name, row in rows.items():
            if _row_green(name, row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round, last_names, last_red


def plan(
    queries: list[str],
    rollover: list[str],
    window: list[str],
    latest: dict[str, int],
    max_round: int,
    last_names: set[str],
    last_red: set[str],
) -> tuple[list[str], list[str], int, dict[str, int]]:
    """Pure window computation — returns (window, leftover, plan_round,
    counts).  ``latest`` maps name -> latest GREEN round; ``last_names``
    / ``last_red`` describe the max-round snapshot's actual rows."""
    overlap = set(window) & last_names
    # ANY overlap means the current window's snapshot landed — a
    # PARTIAL overlap (driver crashed mid-window, rows missing) must
    # not flip the planner to optimistic mode and silently disable the
    # red-row-first policy (the graph_modularity class of slip).  A
    # missing in-window row is judged like any other name: never-
    # attested if it has no green row at all, stale by its old round
    # otherwise.
    window_landed = bool(overlap)
    if window_landed and overlap != set(window):
        missing = sorted(set(window) - overlap)
        print(
            f"# WARNING: current window only PARTIALLY covered by the "
            f"latest snapshot — {len(missing)} name(s) have no row and "
            f"are judged by their prior attestation history: {missing}",
            file=sys.stderr,
        )
    plan_round = max_round + (1 if window_landed else 2)
    if window_landed:
        # the current window's snapshot is committed: judge in-window
        # names by their ACTUAL rows, and surface red ones first
        exclude: set[str] = set()
        red = [n for n in window if n in last_red]
    else:
        # end-of-round optimism: the current window will get a green
        # row in snapshot max_round+1 — always fresh at plan_round
        exclude = set(window)
        red = []
    taken = set(red)
    never = [
        n for n in rollover if n not in latest and n not in exclude and n not in taken
    ]
    never += [
        n
        for n in queries
        if n not in latest and n not in exclude and n not in taken and n not in never
    ]
    candidates = sorted(
        (latest[n], n)
        for n in queries
        if n in latest and n not in exclude and n not in taken
    )
    must = [n for rnd, n in candidates if rnd < plan_round - FRESHNESS_ROUNDS]
    rest = [n for _rnd, n in candidates if n not in must]

    new_window = (red + never + must + rest)[:WINDOW_SIZE]
    leftover = [n for n in red + never + must if n not in new_window]
    counts = {"red": len(red), "never": len(never), "must": len(must)}
    return new_window, leftover, plan_round, counts


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from mqtt2clickhouse_spark.queries import QUERIES, _ROLLOVER, _WINDOW

    latest, max_round, last_names, last_red = ledger(repo)
    window, leftover, plan_round, counts = plan(
        list(QUERIES),
        list(_ROLLOVER),
        list(_WINDOW),
        latest,
        max_round,
        last_names,
        last_red,
    )
    print(
        f"# plan for round r{plan_round:02d} "
        f"(latest committed snapshot: r{max_round:02d})"
    )
    print(
        f"# red-in-latest: {counts['red']}, never-attested: "
        f"{counts['never']}, stale-if-skipped: {counts['must']}"
    )
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
