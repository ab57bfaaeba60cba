"""Derive the NEXT round's 50-name CORRECTNESS window from the driver's
committed snapshots and the registry — the rotation plan, computed
instead of hand-listed (two rounds slipped on the hand-written ritual).

    python scripts/plan_window.py                  # auto-detects timing
    python scripts/plan_window.py --refresh-hashes # round-open ritual

Plan-hash ledger (VERDICT r11 ask #5): ``attested_plan_hashes.json``
beside this script records, per query, a fingerprint of the plan the
driver last attested green — sha256 over the registered function's
source plus its oracle SQL.  A query whose CURRENT fingerprint differs
(or has no ledger entry) was rewritten since its last green row, so its
attestation describes a plan that no longer exists; the planner windows
it right after red rows (tier below).  ``--refresh-hashes`` is the
round-open ritual: run it immediately after the driver's new snapshot
is committed and BEFORE any edits — every name green in that snapshot
has current source == attested source at that instant, so the ledger
entry is stamped from the live registry.  (Scope: the fingerprint sees
the registered function body and the oracle string, not helpers it
calls — a shared-helper rewrite still needs its consumers re-attested
by hand, but the r11 failure class — five query-body rewrites leaving
the window at round open — is caught by construction.)

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


LEDGER_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "attested_plan_hashes.json")


def plan_hash(spec) -> str:
    """Fingerprint of the plan a QuerySpec currently declares: the
    registered function's source (unwrapped past the ``_tuned`` conf
    shim) + the oracle SQL.  Any edit to either invalidates the
    driver's last attestation of this name."""
    import hashlib
    import inspect

    fn = getattr(spec.spark_fn, "__wrapped__", spec.spark_fn)
    src = inspect.getsource(fn)
    return hashlib.sha256(
        (src + "\x00" + (spec.oracle or "")).encode()
    ).hexdigest()


def current_hashes() -> dict[str, str]:
    from mqtt2clickhouse_spark.queries import QUERIES

    return {n: plan_hash(s) for n, s in QUERIES.items()}


def load_ledger() -> dict[str, str]:
    try:
        return json.loads(open(LEDGER_PATH).read())
    except (OSError, json.JSONDecodeError):
        return {}


def changed_since_attested(
    ledger: dict[str, str], current: dict[str, str]
) -> set[str]:
    """Names whose current plan fingerprint does not match the one the
    driver last attested (missing entry == never stamped == changed)."""
    return {n for n, h in current.items() if ledger.get(n) != h}


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
    changed: set[str] | None = None,
) -> tuple[list[str], list[str], int, dict[str, int]]:
    """Pure window computation — returns (window, leftover, plan_round,
    counts).  ``latest`` maps name -> latest GREEN round; ``last_names``
    / ``last_red`` describe the max-round snapshot's actual rows.
    ``changed`` names plans rewritten since their last green row (from
    the plan-hash ledger): their attestation no longer describes the
    shipped code, so they window right after red rows — UNLESS the
    current window will attest them this round anyway (optimistic
    mode's exclude set)."""
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
    # plan-changed tier: attested only on a plan that no longer exists —
    # same urgency class as red (the green row is about the OLD code)
    rewritten = [
        n
        for n in queries
        if changed
        and n in changed
        and n not in exclude
        and n not in taken
    ]
    taken |= set(rewritten)
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

    new_window = (red + rewritten + never + must + rest)[:WINDOW_SIZE]
    leftover = [
        n for n in red + rewritten + never + must if n not in new_window
    ]
    counts = {
        "red": len(red),
        "changed": len(rewritten),
        "never": len(never),
        "must": len(must),
    }
    return new_window, leftover, plan_round, counts


def _edited_since_snapshot(repo: str, max_round: int) -> set[str] | None:
    """Repo-relative source files changed since the driver ran: edits
    COMMITTED after the snapshot landed, edits smuggled INTO the
    snapshot commit itself (the driver ran the tree BEFORE that commit
    existed, so `snap^..HEAD`, not `snap..HEAD`), and DIRTY working-tree
    edits (r12 review x2: `git status` only sees the working tree;
    `snap..HEAD` misses same-commit edits).  Returns ``None`` when git
    cannot answer — the caller must fail CLOSED (refuse to stamp), not
    silently stamp everything."""
    try:
        snap = subprocess.run(
            ["git", "-C", repo, "log", "-1", "--format=%H", "--",
             f"CORRECTNESS_r{max_round:02d}.json"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not snap:
            return None  # snapshot not in git history: can't reason
        diff = subprocess.run(
            ["git", "-C", repo, "diff", "--name-only", f"{snap}^..HEAD",
             "--", "mqtt2clickhouse_spark/"],
            capture_output=True, text=True,
        )
        if diff.returncode != 0:  # root commit: ^ has no parent
            diff = subprocess.run(
                ["git", "-C", repo, "diff", "--name-only",
                 f"{snap}..HEAD", "--", "mqtt2clickhouse_spark/"],
                capture_output=True, text=True, check=True,
            )
        edited = {line for line in diff.stdout.splitlines() if line}
        status = subprocess.run(
            ["git", "-C", repo, "status", "--porcelain", "--",
             "mqtt2clickhouse_spark/"],
            capture_output=True, text=True, check=True,
        ).stdout
        for line in status.splitlines():
            if len(line) > 3:
                edited.add(line[3:].split(" -> ")[-1].strip('"'))
        return edited
    except (OSError, subprocess.SubprocessError):
        return None


def refresh_hashes(repo: str) -> None:
    """Round-open ritual: stamp the ledger for every name green in the
    LATEST committed snapshot (current source == attested source only
    at round open, before edits).  Three guards: a dirty working tree
    warns; a name whose defining module was COMMITTED-to after the
    snapshot landed is NOT stamped (its current source is not what the
    driver ran); deregistered names are pruned."""
    import inspect

    dirty = subprocess.run(
        ["git", "-C", repo, "status", "--porcelain", "--",
         "mqtt2clickhouse_spark/"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    if dirty:
        print(
            "# WARNING: package tree is dirty — a hash stamped now may "
            "describe an UNattested edit, not the plan the driver ran:\n"
            + dirty,
            file=sys.stderr,
        )
    from mqtt2clickhouse_spark.queries import QUERIES

    latest_green, max_round, _names, _red = ledger(repo)
    current = current_hashes()
    edited = _edited_since_snapshot(repo, max_round)
    if edited is None:
        sys.exit(
            "# ABORT: git cannot establish what changed since "
            f"CORRECTNESS_r{max_round:02d} landed — refusing to stamp "
            "(a stamp here could attest source the driver never ran). "
            "Run --refresh-hashes from a working git checkout."
        )

    def _module_edited(name: str) -> bool:
        fn = getattr(QUERIES[name].spark_fn, "__wrapped__",
                     QUERIES[name].spark_fn)
        try:
            src = os.path.relpath(inspect.getsourcefile(fn), repo)
        except (TypeError, ValueError):
            return True  # can't locate the source: refuse to stamp
        return src in edited

    led = load_ledger()
    candidates = [
        n
        for n, rnd in latest_green.items()
        if rnd == max_round and n in current and led.get(n) != current[n]
    ]
    held = (
        sorted(n for n in candidates if n in QUERIES and _module_edited(n))
        if edited
        else []
    )
    stamped = [n for n in candidates if n not in held]
    if held:
        print(
            f"# WARNING: NOT stamping {held} — their modules were "
            f"committed-to after CORRECTNESS_r{max_round:02d} landed, so "
            "the current source may not be what the driver attested; "
            "they stay plan-changed and re-enter the next window",
            file=sys.stderr,
        )
    for n in stamped:
        led[n] = current[n]
    pruned = sorted(set(led) - set(current))
    for n in pruned:
        del led[n]
    with open(LEDGER_PATH, "w") as f:
        json.dump(dict(sorted(led.items())), f, indent=1)
        f.write("\n")
    print(
        f"# stamped {len(stamped)} name(s) green in r{max_round:02d} "
        f"(held {len(held)}, pruned {len(pruned)} deregistered); ledger "
        f"now covers {len(led)}/{len(current)} queries; still "
        f"plan-changed: {sorted(changed_since_attested(led, current))}"
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--refresh-hashes" in sys.argv[1:]:
        refresh_hashes(repo)
        return
    from mqtt2clickhouse_spark.queries import QUERIES, _ROLLOVER, _WINDOW

    latest, max_round, last_names, last_red = ledger(repo)
    changed = changed_since_attested(load_ledger(), current_hashes())
    window, leftover, plan_round, counts = plan(
        list(QUERIES),
        list(_ROLLOVER),
        list(_WINDOW),
        latest,
        max_round,
        last_names,
        last_red,
        changed=changed,
    )
    print(
        f"# plan for round r{plan_round:02d} "
        f"(latest committed snapshot: r{max_round:02d})"
    )
    print(
        f"# red-in-latest: {counts['red']}, plan-changed: "
        f"{counts['changed']}, never-attested: {counts['never']}, "
        f"stale-if-skipped: {counts['must']}"
    )
    if changed:
        print(f"# plan-changed names (hash vs ledger): {sorted(changed)}")
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
