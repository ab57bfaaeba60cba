"""Self-enforcing CORRECTNESS-window rotation (VERDICT r4 ask #4).

The driver's per-round CORRECTNESS snapshot records only the first 50
registered queries (``queries.__init__._WINDOW``).  Rotating that
window used to be a hand-edited ritual each round; these tests make a
forgotten rotation fail the suite instead of the judge:

every registered query must be either
  (a) in the current ``_WINDOW`` (it gets a driver row this round), or
  (b) fully green in a checked-in ``CORRECTNESS_r*.json`` no older
      than ``FRESHNESS_ROUNDS`` rounds (its attestation is fresh), or
  (c) named in ``_ROLLOVER`` (explicitly documented as waiting for the
      next rotation because the 50 slots ran out).

The ledger is derived from the driver's own committed snapshots — no
second bookkeeping file that could itself go stale.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

from mqtt2clickhouse_spark.queries import QUERIES, _ROLLOVER, _WINDOW

REPO = Path(__file__).resolve().parents[1]


def _snapshot_files() -> list[Path]:
    """The driver's COMMITTED CORRECTNESS snapshots (git-tracked only).

    The ledger must not see an untracked snapshot the driver just wrote
    mid-round: that would bump ``current_round`` before the next
    session's rotation commit can land, turning the working tree red
    through no fault of the registry (observed between rounds 6 and 7).
    Falls back to a plain glob when git is unavailable (e.g. a source
    tarball), where tracked == on-disk anyway.
    """
    try:
        out = subprocess.run(
            ["git", "-C", str(REPO), "ls-files", "--", "CORRECTNESS_r*.json"],
            capture_output=True,
            text=True,
            check=True,
            timeout=30,
        ).stdout
        return sorted(REPO / line for line in out.splitlines() if line)
    except (OSError, subprocess.SubprocessError):
        return sorted(REPO.glob("CORRECTNESS_r*.json"))

# queries whose driver check is rows-only by design (no value hash).
# Empty since r9: distinct_approx gained a calibration oracle (VERDICT
# r8 ask #3); its historic `err: no_oracle` rows no longer count green.
_ROWS_ONLY: set[str] = set()

#: Freshness bar in rounds (VERDICT r5 ask #2).  Derivation: the driver
#: snapshot holds 50 rows per round, so a bar of K rounds makes at most
#: 50 (current window) + K*50 (distinct names across the last K
#: snapshots) = (K+1)*50 names simultaneously fresh.  The 2-round bar
#: used through round 5 caps at 150 < 161 registered queries — it
#: became arithmetically unsatisfiable the moment the surface crossed
#: 150.  K=3 gives a 200-name static capacity; the sustainable refresh
#: CYCLE is K*50 = 150 names, so ``_ROLLOVER`` legitimately carries up
#: to ``len(QUERIES) - 150`` names between rotations (see the comment
#: on ``_ROLLOVER`` in queries/__init__.py).
FRESHNESS_ROUNDS = 3


def _ledger() -> tuple[dict[str, int], int]:
    """name -> latest round with a fully-green driver row, and the
    round currently being built (latest snapshot + 1)."""
    latest_green: dict[str, int] = {}
    max_round = 0
    for f in _snapshot_files():
        m = re.search(r"CORRECTNESS_r(\d+)\.json", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        data = json.loads(f.read_text())
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if name in _ROWS_ONLY:
                # no oracle by design: the driver records err='no_oracle'
                # and only checks the Spark side ran and returned rows
                green = (
                    row.get("spark_rows") is not None
                    and row.get("spark_rows") >= 0
                    and row.get("err") in (None, "no_oracle")
                )
            else:
                green = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and not row.get("err")
                )
            if green:
                latest_green[name] = max(latest_green.get(name, 0), rnd)
    return latest_green, max_round + 1


def test_snapshots_exist():
    # the construction assumes the driver's snapshots are committed
    assert _snapshot_files(), (
        "no driver CORRECTNESS snapshots found — the rotation ledger "
        "cannot be derived"
    )


def test_window_is_exactly_50():
    assert len(_WINDOW) == 50, len(_WINDOW)
    assert len(set(_WINDOW)) == 50, "duplicate names in _WINDOW"
    assert list(QUERIES)[:50] == _WINDOW


def test_every_query_windowed_attested_or_rolled_over():
    ledger, current_round = _ledger()
    stale: list[str] = []
    for name in QUERIES:
        if name in _WINDOW:
            continue
        if ledger.get(name, -(10**9)) >= current_round - FRESHNESS_ROUNDS:
            continue
        if name in _ROLLOVER:
            continue
        stale.append(
            f"{name} (latest green: r{ledger.get(name, 0):02d})"
        )
    assert not stale, (
        "rotation forgotten — these queries are neither in the current "
        f"_WINDOW, nor driver-green within the last {FRESHNESS_ROUNDS} "
        f"rounds, nor explicitly rolled over: {stale}"
    )


def test_rollover_list_is_minimal():
    """_ROLLOVER may only name queries that genuinely need it — a name
    that is windowed or freshly attested is stale documentation."""
    ledger, current_round = _ledger()
    redundant = [
        n
        for n in _ROLLOVER
        if n in _WINDOW
        or ledger.get(n, -(10**9)) >= current_round - FRESHNESS_ROUNDS
    ]
    assert not redundant, f"stale _ROLLOVER entries: {redundant}"
    unregistered = [n for n in _ROLLOVER if n not in QUERIES]
    assert not unregistered, f"unknown _ROLLOVER names: {unregistered}"


def test_plan_changed_queries_land_in_upcoming_window():
    """VERDICT r11 ask #5 — the structural gap behind the r11
    attestation debt: five plans were rewritten mid-round, AFTER the
    window was fixed at round open, so their driver rows kept attesting
    the OLD plans.  The plan-hash ledger (scripts/attested_plan_hashes
    .json, stamped by ``plan_window.py --refresh-hashes`` at round
    open) records each query's fingerprint as last driver-attested;
    this test fails if any query whose CURRENT fingerprint differs
    would be left out of the upcoming window — either the planner's
    computed next window, or (optimistic mode) the current ``_WINDOW``
    that the driver will attest on the new plan at round end.

    Capacity rule (r15): a shared-helper edit can fan out to MORE
    plan-changed names than one 50-slot window holds (the r15
    components/skew/sink fixes flagged 84).  Names that cannot fit must
    then appear in the planner's ``leftover`` — the explicit
    first-in-line-for-the-NEXT-rotation queue — so nothing is silently
    dropped: the ledger keeps them flagged (a held name is never
    restamped until a driver row lands on its NEW hash) and the
    planner re-surfaces them every round until attested."""
    import sys as _sys

    _sys.path.insert(0, str(REPO / "scripts"))
    import plan_window as pw

    current = pw.current_hashes()
    led = pw.load_ledger()
    assert led, "attested_plan_hashes.json missing or empty — run " \
        "scripts/plan_window.py --refresh-hashes at round open"
    changed = pw.changed_since_attested(led, current)
    latest, max_round, last_names, last_red = pw.ledger(str(REPO))
    new_window, leftover, plan_round, _counts = pw.plan(
        list(QUERIES), list(_ROLLOVER), list(_WINDOW), latest,
        max_round, last_names, last_red, changed=changed,
    )
    landed = plan_round == max_round + 1
    covered = set(new_window) | (set() if landed else set(_WINDOW))
    missing = sorted(changed - covered - set(leftover))
    assert not missing, (
        "plan-changed queries would miss the upcoming window AND the "
        "planner's explicit next-rotation queue (their green rows "
        f"attest code that no longer exists): {missing}"
    )


def test_plan_hash_sees_through_the_tuned_wrapper():
    """The fingerprint must hash the QUERY function's source, not the
    shared ``_tuned`` conf shim (which would make every plan hash move
    in lockstep and mask individual rewrites)."""
    import sys as _sys

    _sys.path.insert(0, str(REPO / "scripts"))
    import plan_window as pw

    hashes = {pw.plan_hash(s) for s in QUERIES.values()}
    assert len(hashes) == len(QUERIES), (
        "plan hashes collide — the ledger cannot distinguish rewrites"
    )
