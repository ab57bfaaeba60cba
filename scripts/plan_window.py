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
entry is stamped from the live registry.

Helper-aware since r13 (VERDICT r12 ask #2 — the helper-blind gap):
the fingerprint folds in, per query, the comment/docstring-insensitive
AST fingerprints of the SHARED package modules the query depends on —
``ops/*``, ``tables.py``, ``session.py``, ``ingest/*``,
``streaming/*``, ``queries/base.py`` (everything outside the
query-registration modules), closed transitively over the shared
modules' own imports.  Attribution is two-tier: a module-level import
marks every query registered in that module; an import inside the
registered function's body marks that query alone (the house style for
twins — e.g. ``sink_routing_twin`` imports ``ingest.sink`` in-body, so
an ``ingest/sink.py`` rewrite flags exactly its consumers, the r12
instance that had to be handled by hand).  Comment-only and
docstring-only helper edits do NOT move fingerprints (the AST dump is
hashed after stripping docstrings), so there is no false-positive
storm on doc passes.  Residual scope: helpers defined in the SAME
query module, and cross-query-module imports (oracle-text constants —
already covered because the oracle STRING is hashed), stay outside the
fingerprint; the refresh-time module-edit hold covers the former.

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


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = "mqtt2clickhouse_spark"

#: path -> parsed AST (script lifetime is one process; files don't move
#: under us mid-run)
_TREE_CACHE: dict[str, object] = {}
_FP_CACHE: dict[str, str] = {}


def _parse(path: str):
    if path not in _TREE_CACHE:
        import ast

        with open(path, encoding="utf-8") as f:
            _TREE_CACHE[path] = ast.parse(f.read(), filename=path)
    return _TREE_CACHE[path]


def _ast_fingerprint(path: str) -> str:
    """sha256 of the module's docstring-stripped ``ast.unparse`` —
    insensitive to comments, whitespace, and doc edits (the r12 freeze
    ritual promotes residuals into docstrings; that must not flag every
    consumer), sensitive to any code change.  ``unparse`` (canonical
    source), NOT ``ast.dump`` (ADVICE r13: the dump's format tracks the
    AST node/field layout, which moves across Python minor versions —
    an interpreter upgrade would flip every ledger hash at once);
    canonical source only depends on the language syntax the module
    actually uses.  The ledger additionally records the stamping
    interpreter under ``_python`` so a residual cross-version drift is
    diagnosable as a migration event, not read as 236 real rewrites."""
    if path in _FP_CACHE:
        return _FP_CACHE[path]
    import ast
    import copy
    import hashlib

    tree = copy.deepcopy(_parse(path))
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(
                node,
                (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef,
                 ast.ClassDef),
            )
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            del body[0]
            if not body:  # docstring-only body: unparse needs a stmt
                body.append(ast.Pass())
    fp = hashlib.sha256(ast.unparse(tree).encode()).hexdigest()
    _FP_CACHE[path] = fp
    return fp


def _shared_modules() -> dict[str, str]:
    """Dotted module name -> repo-relative path, for every package
    module that is NOT a query-registration module: ``queries/*`` is
    excluded except ``queries/base.py`` (register/t/load_table — an
    edit there legitimately touches every plan)."""
    out: dict[str, str] = {}
    pkg_dir = os.path.join(_REPO, _PKG)
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fname in filenames:
            if not fname.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fname), _REPO)
            parts = rel[: -len(".py")].split(os.sep)
            if parts[-1] == "__init__":
                parts = parts[:-1]
            if len(parts) > 1 and parts[1] == "queries" and parts[-1] != "base":
                continue
            out[".".join(parts)] = rel
    return out


def _imports_in(
    nodes, pkg: str, shared: dict[str, str], is_pkg: bool = False
) -> set[str]:
    """Shared-module names imported anywhere under ``nodes`` (resolving
    ``from X import name`` where ``name`` is itself a submodule, and
    relative imports against ``pkg``).  ``is_pkg`` says whether ``pkg``
    names a package (__init__) or a plain module — a level-1 relative
    import anchors at the package ITSELF for the former but at the
    PARENT for the latter (the house style is absolute imports, so this
    path is belt-and-braces, but a wrong anchor would silently miss a
    dep — a fail-open)."""
    import ast

    found: set[str] = set()

    def _hit(dotted: str) -> None:
        if dotted in shared:
            found.add(dotted)

    def _hit_with_ancestors(dotted: str) -> None:
        # importing a.b.c executes the a and a.b package __init__s too,
        # so an edit there must flag the consumer — for BOTH import
        # forms (ADVICE r13: the ImportFrom branch used to mark only
        # the resolved base, a fail-open dep edge on shared-package
        # __init__ edits for from-import consumers)
        _hit(dotted)
        parts = dotted.split(".")
        for i in range(1, len(parts)):
            _hit(".".join(parts[:i]))

    for root in nodes:
        for node in ast.walk(root):
            if isinstance(node, ast.Import):
                for alias in node.names:
                    _hit_with_ancestors(alias.name)
            elif isinstance(node, ast.ImportFrom):
                base = node.module or ""
                if node.level:
                    anchor = pkg.split(".")
                    if not is_pkg:
                        anchor = anchor[:-1]  # plain module: parent pkg
                    anchor = anchor[: len(anchor) - (node.level - 1)]
                    base = ".".join(anchor + ([base] if base else []))
                _hit_with_ancestors(base)
                for alias in node.names:
                    _hit(f"{base}.{alias.name}")
    return found


def _shared_closures() -> dict[str, tuple[str, set[str]]]:
    """Per shared module: (closure fingerprint, closure file set).
    The closure fingerprint folds the module's own AST fingerprint with
    those of every shared module transitively reachable through its
    imports — so an edit to ``ops/store.py`` moves the fingerprint of
    ``ops/dedup.py`` (which imports it) and thereby every consumer's
    plan hash."""
    import hashlib

    shared = _shared_modules()
    graph: dict[str, set[str]] = {}
    for mod, rel in shared.items():
        tree = _parse(os.path.join(_REPO, rel))
        graph[mod] = _imports_in(
            [tree], mod, shared, is_pkg=rel.endswith("__init__.py")
        ) - {mod}
    out: dict[str, tuple[str, set[str]]] = {}
    for mod in shared:
        closure = {mod}
        stack = [mod]
        while stack:
            for dep in graph[stack.pop()]:
                if dep not in closure:
                    closure.add(dep)
                    stack.append(dep)
        files = {shared[m] for m in closure}
        fp = hashlib.sha256(
            "\n".join(
                f"{m}={_ast_fingerprint(os.path.join(_REPO, shared[m]))}"
                for m in sorted(closure)
            ).encode()
        ).hexdigest()
        out[mod] = (fp, files)
    return out


_CLOSURES: dict[str, tuple[str, set[str]]] | None = None


def _closures() -> dict[str, tuple[str, set[str]]]:
    global _CLOSURES
    if _CLOSURES is None:
        _CLOSURES = _shared_closures()
    return _CLOSURES


def _defining_module(fn, repo: str = _REPO) -> tuple[str | None, str]:
    """(repo-relative source path or None, dotted module name) of the
    function's defining module — realpath-normalized on BOTH sides
    (ADVICE r12: a symlinked checkout made relpath yield '../…' which
    silently failed OPEN; outside-the-repo now reads as unlocatable)."""
    import inspect

    try:
        src = inspect.getsourcefile(fn)
        if src is None:
            return None, ""
        rel = os.path.relpath(os.path.realpath(src), os.path.realpath(repo))
    except (TypeError, ValueError, OSError):
        return None, ""
    if rel.startswith(".."):
        return None, ""
    parts = rel[: -len(".py")].split(os.sep)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return rel, ".".join(parts)


def _query_deps(fn, repo: str = _REPO) -> tuple[set[str], str | None]:
    """(shared modules this query depends on, defining module relpath).
    Module-level imports count for every query in the module; imports
    inside the registered function's own body count for it alone."""
    import ast

    rel, pkg = _defining_module(fn, repo)
    if rel is None:
        return set(), None
    shared = _shared_modules()
    tree = _parse(os.path.join(repo, rel))
    is_pkg = rel.endswith("__init__.py")
    top_level = [
        n
        for n in tree.body
        if not isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]
    deps = _imports_in(top_level, pkg, shared, is_pkg=is_pkg)
    own = [
        n
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        and n.name == fn.__name__
    ]
    deps |= _imports_in(own, pkg, shared, is_pkg=is_pkg)
    return deps, rel


def plan_hash(spec) -> str:
    """Fingerprint of the plan a QuerySpec currently declares: the
    registered function's source (unwrapped past the ``_tuned`` conf
    shim) + the oracle SQL + the closure fingerprints of every shared
    package module the query imports (module-level or in-body).  Any
    edit to any of them invalidates the driver's last attestation of
    this name."""
    import hashlib
    import inspect

    fn = getattr(spec.spark_fn, "__wrapped__", spec.spark_fn)
    src = inspect.getsource(fn)
    deps, _rel = _query_deps(fn)
    closures = _closures()
    dep_part = "\n".join(
        f"{m}={closures[m][0]}" for m in sorted(deps) if m in closures
    )
    return hashlib.sha256(
        (src + "\x00" + (spec.oracle or "") + "\x00" + dep_part).encode()
    ).hexdigest()


def attestation_input_files(spec, repo: str = _REPO) -> set[str]:
    """Repo-relative files whose edit invalidates this query's
    attestation: the defining module plus the closure files of every
    shared dep — the refresh-time hold must check ALL of them, or a
    helper edit committed mid-round would be stamped as attested."""
    fn = getattr(spec.spark_fn, "__wrapped__", spec.spark_fn)
    deps, rel = _query_deps(fn, repo)
    if rel is None:
        return set()
    closures = _closures()
    files = {rel}
    for m in deps:
        if m in closures:
            files |= closures[m][1]
    return files


def current_hashes() -> dict[str, str]:
    from mqtt2clickhouse_spark.queries import QUERIES

    return {n: plan_hash(s) for n, s in QUERIES.items()}


def load_ledger() -> dict[str, str]:
    try:
        return json.loads(open(LEDGER_PATH).read())
    except (OSError, json.JSONDecodeError):
        return {}


def _warn_if_cross_python(led: dict[str, str]) -> None:
    """ADVICE r13 diagnosability: the ledger records the interpreter it
    was stamped under (``_python``).  The unparse-based fingerprint is
    version-stable by construction, but if a future Python DID move it,
    every name would flag plan-changed at once — fail-closed, yet
    indistinguishable from 236 real rewrites without this tripwire."""
    stamped = led.get("_python")
    here = ".".join(map(str, sys.version_info[:2]))
    if isinstance(stamped, str) and stamped.rsplit(".", 1)[0] != here:
        print(
            f"# WARNING: ledger was stamped under Python {stamped}, this "
            f"is {here}.x — if every name suddenly reads plan-changed, "
            "that is a cross-version fingerprint drift (a migration "
            "event), not 236 real rewrites; re-run --refresh-hashes "
            "round-open under ONE interpreter and keep using it",
            file=sys.stderr,
        )


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
    warns; a name ANY of whose attestation input files (defining module
    plus shared-helper closure) was COMMITTED-to after the snapshot
    landed is NOT stamped (its current plan inputs are not what the
    driver ran); deregistered names are pruned."""
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
        files = attestation_input_files(QUERIES[name], repo)
        if not files:
            return True  # can't locate the source: refuse to stamp
        return bool(files & edited)

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
    _warn_if_cross_python(led)
    for n in stamped:
        led[n] = current[n]
    # "_"-prefixed keys are ledger metadata, never query names
    pruned = sorted(n for n in set(led) - set(current)
                    if not n.startswith("_"))
    for n in pruned:
        del led[n]
    led["_python"] = ".".join(map(str, sys.version_info[:3]))
    with open(LEDGER_PATH, "w") as f:
        json.dump(dict(sorted(led.items())), f, indent=1)
        f.write("\n")
    covered = sum(1 for n in led if not n.startswith("_"))
    print(
        f"# stamped {len(stamped)} name(s) green in r{max_round:02d} "
        f"(held {len(held)}, pruned {len(pruned)} deregistered); ledger "
        f"now covers {covered}/{len(current)} queries; still "
        f"plan-changed: {sorted(changed_since_attested(led, current))}"
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--refresh-hashes" in sys.argv[1:]:
        refresh_hashes(repo)
        return
    from mqtt2clickhouse_spark.queries import QUERIES, _ROLLOVER, _WINDOW

    latest, max_round, last_names, last_red = ledger(repo)
    led = load_ledger()
    _warn_if_cross_python(led)
    changed = changed_since_attested(led, current_hashes())
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
