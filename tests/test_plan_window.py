"""Unit tests for scripts/plan_window.py's pure planning core.

The r7 lesson: the old planner assumed every current-``_WINDOW`` name
comes back green in the about-to-land snapshot, so a red row
(graph_modularity, hash_match false) was silently dropped from the
next window and its fix would have waited an extra round for
re-attestation.  These tests pin the corrected behavior with a
synthetic red row (VERDICT r7 ask #3).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from plan_window import WINDOW_SIZE, plan  # noqa: E402


def _mk(n_queries: int) -> list[str]:
    return [f"q{i:03d}" for i in range(n_queries)]


def test_red_row_heads_the_next_window():
    """A query whose latest-snapshot row is red is re-windowed FIRST,
    even when never-attested names overflow the 50 slots."""
    queries = _mk(120)
    window = queries[:50]                    # current window, snapshot landed
    rollover = queries[50:110]               # 60 never-attested — overflow
    latest = {n: 7 for n in window if n != "q003"}  # q003's row was red
    latest.update({n: 5 for n in queries[110:]})
    last_names = set(window)
    last_red = {"q003"}
    new_window, leftover, plan_round, counts = plan(
        queries, rollover, window, latest, 7, last_names, last_red
    )
    assert plan_round == 8
    assert counts["red"] == 1
    assert new_window[0] == "q003"
    assert len(new_window) == WINDOW_SIZE
    # 1 red + 49 of the 60 never-attested fit; 11 roll over
    assert new_window[1:] == rollover[:49]
    assert leftover == rollover[49:]


def test_red_row_with_older_green_is_still_rewindowed():
    """A red latest row must win over an older green row — the fix
    needs re-attestation now, not when the old green goes stale."""
    queries = _mk(60)
    window = queries[:50]
    latest = {n: 7 for n in window}
    latest["q001"] = 4                       # old green; r7 row red
    latest.update({n: 6 for n in queries[50:]})
    new_window, _leftover, plan_round, counts = plan(
        queries, [], window, latest, 7, set(window), {"q001"}
    )
    assert plan_round == 8
    assert new_window[0] == "q001"


def test_optimistic_mode_when_snapshot_not_landed():
    """End-of-round timing: the current window has no snapshot yet, so
    it is assumed green-in-max_round+1 and excluded; the plan targets
    max_round+2."""
    queries = _mk(60)
    window = queries[:50]
    latest = {n: 5 for n in queries[50:]}
    new_window, _leftover, plan_round, counts = plan(
        queries, queries[50:], window, latest, 6, set(), set()
    )
    assert plan_round == 8
    assert counts["red"] == 0
    assert not set(new_window) & set(window)
    assert new_window[:10] == queries[50:60]


def test_partial_snapshot_still_counts_as_landed(capsys):
    """ADVICE r8: if the driver crashed mid-window and ONE row is
    missing, the planner must NOT flip to optimistic mode (which
    excludes the whole window and disables red-row-first).  Partial
    overlap = landed; missing-row names are judged by their history
    (never-attested here, so re-windowed first), and a loud warning
    names them."""
    import io
    from contextlib import redirect_stderr

    queries = _mk(60)
    window = queries[:50]
    # q003's row is missing from the landed snapshot AND it has never
    # been green; q007's row landed red
    latest = {n: 7 for n in window if n != "q003"}
    latest.update({n: 5 for n in queries[50:]})
    last_names = set(window) - {"q003"}
    err = io.StringIO()
    with redirect_stderr(err):
        new_window, _leftover, plan_round, counts = plan(
            queries, [], window, latest, 7, last_names, {"q007"}
        )
    assert plan_round == 8, "partial overlap must count as landed"
    assert counts["red"] == 1
    assert new_window[0] == "q007"          # red row still heads
    assert "q003" in new_window[:3]         # missing row re-windowed
    assert "q003" in err.getvalue()         # and loudly named


def test_stale_names_precede_fresh_fill():
    queries = _mk(55)
    window = queries[:50]
    latest = {n: 7 for n in window}
    latest["q050"] = 3                       # stale at round 8 (bar = 5)
    latest.update({n: 6 for n in queries[51:]})
    new_window, leftover, plan_round, counts = plan(
        queries, [], window, latest, 7, set(window), set()
    )
    assert plan_round == 8
    assert counts["must"] == 1
    assert new_window[0] == "q050"
    assert not leftover


def test_plan_changed_tier_windows_right_after_red():
    """VERDICT r11 ask #5: a query whose plan was rewritten since its
    last green row (hash vs the attested-plan ledger) is effectively
    unattested — its green row describes code that no longer exists —
    so it must land in the next window right after red rows, ahead of
    never-attested and stale names."""
    queries = _mk(120)
    window = queries[:50]
    rollover = queries[50:110]               # never-attested overflow
    latest = {n: 7 for n in window if n != "q003"}
    latest.update({n: 7 for n in queries[110:]})   # fresh greens
    changed = {"q115", "q112"}               # fresh — but plans rewritten
    new_window, leftover, plan_round, counts = plan(
        queries, rollover, window, latest, 7, set(window), {"q003"},
        changed=changed,
    )
    assert plan_round == 8
    assert counts["red"] == 1 and counts["changed"] == 2
    assert new_window[0] == "q003"           # red still first
    assert new_window[1:3] == ["q112", "q115"]  # changed tier next
    assert len(new_window) == WINDOW_SIZE
    # never-attested fill the rest; overflow rolls over
    assert new_window[3:] == rollover[:47]
    assert leftover == rollover[47:]


def test_plan_changed_inside_current_window_is_not_rewindowed():
    """Optimistic mode: a changed name already in the current window
    will be attested on the NEW plan when the driver runs this round —
    re-windowing it next round would waste a slot."""
    queries = _mk(60)
    window = queries[:50]
    latest = {n: 5 for n in queries[50:]}
    new_window, _leftover, plan_round, counts = plan(
        queries, queries[50:], window, latest, 6, set(), set(),
        changed={"q010", "q055"},            # q010 windowed, q055 not
    )
    assert plan_round == 8
    assert counts["changed"] == 1
    assert "q010" not in new_window
    assert new_window[0] == "q055"


def test_refresh_hashes_stamps_only_latest_round_greens(monkeypatch, tmp_path):
    """--refresh-hashes is the round-open ritual: only names green in
    the LATEST committed snapshot get (re)stamped — an older green must
    not overwrite a pending plan-change flag, because its attested
    source is no longer reconstructible from the working tree."""
    import plan_window as pw

    led_path = tmp_path / "ledger.json"
    monkeypatch.setattr(pw, "LEDGER_PATH", str(led_path))
    monkeypatch.setattr(
        pw, "ledger",
        lambda repo: ({"a": 9, "b": 9, "c": 7}, 9, {"a", "b"}, set()),
    )
    monkeypatch.setattr(
        pw, "current_hashes", lambda: {"a": "HA", "b": "HB", "c": "HC"}
    )
    led_path.write_text('{"b": "OLD"}')
    pw.refresh_hashes(str(pw.os.path.dirname(pw.os.path.dirname(
        pw.os.path.abspath(pw.__file__)))))
    import json as _json

    led = _json.loads(led_path.read_text())
    assert led["a"] == "HA"                 # green in r9 -> stamped
    assert led["b"] == "HB"                 # re-stamped to current
    assert "c" not in led                   # r7 green: NOT stamped


def _fake_query_module(tmp_path, name):
    """A real module file on disk so inspect.getsourcefile resolves and
    the hold guard's repo-relative path matching is ACTUALLY exercised
    (r12 review: the first version of this test forced the unlocatable
    fallback for both names, leaving `src in edited` with zero
    coverage)."""
    import importlib.util

    p = tmp_path / f"{name}.py"
    p.write_text("def q(spark, sf_dir):\n    return None\n")
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.q


def test_refresh_hashes_holds_names_committed_after_snapshot(
    monkeypatch, tmp_path
):
    """A rewrite committed (or dirty) after the snapshot landed must
    not be stamped as attested: the name whose real source file appears
    in the edited set is HELD; the untouched sibling is stamped."""
    import plan_window as pw

    led_path = tmp_path / "ledger.json"
    monkeypatch.setattr(pw, "LEDGER_PATH", str(led_path))
    monkeypatch.setattr(
        pw, "ledger", lambda repo: ({"a": 9, "b": 9}, 9, {"a", "b"}, set())
    )
    monkeypatch.setattr(pw, "current_hashes", lambda: {"a": "HA", "b": "HB"})
    monkeypatch.setattr(
        pw, "_edited_since_snapshot", lambda repo, r: {"mod_a.py"}
    )

    class _Spec:
        def __init__(self, fn):
            self.spark_fn = fn

    fake_queries = {
        "a": _Spec(_fake_query_module(tmp_path, "mod_a")),
        "b": _Spec(_fake_query_module(tmp_path, "mod_b")),
    }
    import mqtt2clickhouse_spark.queries as q

    monkeypatch.setattr(q, "QUERIES", fake_queries)
    led_path.write_text("{}")
    pw.refresh_hashes(str(tmp_path))
    import json as _json

    led = _json.loads(led_path.read_text())
    assert "a" not in led, "edited module was stamped as attested"
    assert led.get("b") == "HB", "untouched sibling was not stamped"


def test_refresh_hashes_aborts_when_git_cannot_answer(
    monkeypatch, tmp_path
):
    """Fail CLOSED (r12 review): when git cannot establish what changed
    since the snapshot, refusing to stamp beats silently stamping
    everything — the guard must never degrade open."""
    import pytest

    import plan_window as pw

    led_path = tmp_path / "ledger.json"
    monkeypatch.setattr(pw, "LEDGER_PATH", str(led_path))
    monkeypatch.setattr(pw, "ledger", lambda repo: ({"a": 9}, 9, {"a"}, set()))
    monkeypatch.setattr(pw, "current_hashes", lambda: {"a": "HA"})
    monkeypatch.setattr(pw, "_edited_since_snapshot", lambda repo, r: None)
    led_path.write_text("{}")
    with pytest.raises(SystemExit):
        pw.refresh_hashes(str(tmp_path))
    import json as _json

    assert _json.loads(led_path.read_text()) == {}  # nothing stamped


def test_refresh_hashes_prunes_deregistered_names(monkeypatch, tmp_path):
    import plan_window as pw

    led_path = tmp_path / "ledger.json"
    monkeypatch.setattr(pw, "LEDGER_PATH", str(led_path))
    monkeypatch.setattr(pw, "ledger", lambda repo: ({"a": 9}, 9, {"a"}, set()))
    monkeypatch.setattr(pw, "current_hashes", lambda: {"a": "HA"})
    monkeypatch.setattr(pw, "_edited_since_snapshot", lambda repo, r: set())
    led_path.write_text('{"gone_query": "OLD"}')
    pw.refresh_hashes(str(tmp_path))
    import json as _json

    led = _json.loads(led_path.read_text())
    # stamped fresh, dead name pruned; the "_python" metadata key
    # (ADVICE r13: record the stamping interpreter) is NOT pruned
    assert {k: v for k, v in led.items() if not k.startswith("_")} == {
        "a": "HA"
    }
    import sys as _sys

    assert led["_python"] == ".".join(map(str, _sys.version_info[:3]))

# --- helper-aware fingerprints (VERDICT r12 ask #2) ----------------------


def _reset_fp_caches(pw):
    pw._TREE_CACHE.clear()
    pw._FP_CACHE.clear()
    pw._CLOSURES = None


def test_helper_edit_flags_registered_consumers_into_window(monkeypatch):
    """The r11 gap class, helper edition: rewriting a shared op
    (ops/dedup.py here) must move the plan fingerprint of every
    registered consumer — and ONLY consumers — so the planner's
    plan-changed tier windows them all; the r12 ledger saw the function
    body alone and a helper rewrite left consumers' stale green rows
    standing."""
    import plan_window as pw
    from mqtt2clickhouse_spark.queries import QUERIES, _ROLLOVER, _WINDOW

    _reset_fp_caches(pw)
    before = pw.current_hashes()

    dedup_path = os.path.join(pw._REPO, pw._PKG, "ops", "dedup.py")
    real_fp = pw._ast_fingerprint

    def fake_fp(path):
        if os.path.abspath(path) == dedup_path:
            return "EDITED" * 10
        return real_fp(path)

    # the caches hold the FAKE fingerprint while patched — always reset
    # on the way out, or a failure here poisons every later test that
    # calls current_hashes in this session
    try:
        _reset_fp_caches(pw)
        monkeypatch.setattr(pw, "_ast_fingerprint", fake_fp)
        after = pw.current_hashes()
    finally:
        monkeypatch.undo()
        _reset_fp_caches(pw)

    changed = {n for n in before if before[n] != after[n]}
    # known consumers: dedup_queries imports ops.dedup at module level;
    # sink_routing_twin reaches it through ingest/sink's closure
    assert "dedup_jaccard" in changed
    assert "dedup_exact" in changed
    # a query with no path to ops/dedup must NOT be flagged
    assert "q1_pricing_summary" not in changed
    assert "seq_pattern_match" not in changed
    assert changed, "helper edit flagged no consumers"

    latest, max_round, last_names, last_red = pw.ledger(str(pw._REPO))
    new_window, leftover, plan_round, counts = plan(
        list(QUERIES), list(_ROLLOVER), list(_WINDOW), latest,
        max_round, last_names, last_red, changed=changed,
    )
    # every flagged consumer is either in the upcoming window or FORCED
    # into _ROLLOVER (leftover) — ops/dedup.py fans out to ~78 module-
    # level consumers, more than one 50-slot window holds, so the
    # planner must carry the overflow, never silently drop it
    covered = set(new_window) | set(leftover) | (
        set() if plan_round == max_round + 1 else set(_WINDOW)
    )
    missing = sorted(changed - covered)
    assert not missing, (
        f"helper-edit consumers silently dropped from the rotation: {missing}"
    )
    assert set(new_window) & changed, (
        "no flagged consumer made the upcoming window at all"
    )


def test_from_import_marks_ancestor_packages(tmp_path):
    """ADVICE r13: `from a.b.c import x` executes the a and a.b package
    __init__s just like `import a.b.c` does, so BOTH import forms must
    mark every dotted ancestor as a dep — the ImportFrom branch used to
    mark only the resolved base, silently not folding shared-package
    __init__ edits into from-import consumers' fingerprints."""
    import ast

    import plan_window as pw

    shared = {
        "a": "a/__init__.py",
        "a.b": "a/b/__init__.py",
        "a.b.c": "a/b/c.py",
    }
    plain = ast.parse("import a.b.c\n")
    fromi = ast.parse("from a.b.c import x\n")
    frombase = ast.parse("from a.b import c\n")
    assert pw._imports_in([plain], "m", shared) == {"a", "a.b", "a.b.c"}
    assert pw._imports_in([fromi], "m", shared) == {"a", "a.b", "a.b.c"}
    # `from a.b import c` resolves the submodule AND its ancestors
    assert pw._imports_in([frombase], "m", shared) == {"a", "a.b", "a.b.c"}
    # relative form inside package a.b: `from . import c`
    rel = ast.parse("from . import c\n")
    got = pw._imports_in([rel], "a.b", shared, is_pkg=True)
    assert got == {"a", "a.b", "a.b.c"}


def test_fingerprint_in_vivo_from_import_init_edit_flags_consumers(
    monkeypatch,
):
    """The real-tree instance of the ADVICE r13 fail-open edge: editing
    a shared package __init__ (ingest/__init__.py here) must move the
    fingerprint of queries that reach ingest modules via from-imports."""
    import plan_window as pw

    _reset_fp_caches(pw)
    before = pw.current_hashes()
    init_path = os.path.join(pw._REPO, pw._PKG, "ingest", "__init__.py")
    real_fp = pw._ast_fingerprint

    def fake_fp(path):
        if os.path.abspath(path) == init_path:
            return "EDITED" * 10
        return real_fp(path)

    try:
        _reset_fp_caches(pw)
        monkeypatch.setattr(pw, "_ast_fingerprint", fake_fp)
        after = pw.current_hashes()
    finally:
        monkeypatch.undo()
        _reset_fp_caches(pw)
    changed = {n for n in before if before[n] != after[n]}
    # twins import ingest.sink / ingest.parse in-body; the ingest
    # package __init__ runs on either import form
    assert "sink_routing_twin" in changed
    assert "mqtt_pipeline" in changed
    # a pure-TPCH query never touches ingest
    assert "q1_pricing_summary" not in changed


def test_comment_and_docstring_edits_do_not_move_fingerprints(tmp_path):
    """No false-positive storm on doc passes (the r12 store.py freeze
    promoted residuals into a module docstring — that kind of edit must
    not flag every consumer); a real code edit must."""
    import plan_window as pw

    a = tmp_path / "a.py"
    a.write_text(
        '"""Module doc."""\n\n'
        "def f(x):\n"
        '    """Doc."""\n'
        "    return x + 1  # add one\n"
    )
    b = tmp_path / "b.py"
    b.write_text(
        '"""Module doc, REWRITTEN extensively with residuals."""\n'
        "# a brand new comment pass\n\n"
        "def f(x):\n"
        '    """Different doc."""\n'
        "    # another comment\n"
        "    return x + 1\n"
    )
    c = tmp_path / "c.py"
    c.write_text(
        '"""Module doc."""\n\n'
        "def f(x):\n"
        '    """Doc."""\n'
        "    return x + 2\n"
    )
    assert pw._ast_fingerprint(str(a)) == pw._ast_fingerprint(str(b))
    assert pw._ast_fingerprint(str(a)) != pw._ast_fingerprint(str(c))


def test_defining_module_realpath_normalized(tmp_path):
    """ADVICE r12: a checkout reached through a symlink made relpath
    yield '../…' that never matched git's repo-relative paths, so the
    hold guard silently degraded OPEN.  Both sides are realpath'd now:
    a symlinked repo root resolves to the true relative path, and a
    source genuinely outside the repo reads as unlocatable (held)."""
    import plan_window as pw
    from mqtt2clickhouse_spark.queries import QUERIES

    spec = QUERIES["q1_pricing_summary"]
    fn = getattr(spec.spark_fn, "__wrapped__", spec.spark_fn)

    direct_rel, direct_mod = pw._defining_module(fn, pw._REPO)
    assert direct_rel is not None and direct_rel.startswith(pw._PKG)

    link = tmp_path / "repo-link"
    os.symlink(pw._REPO, link)
    rel, mod = pw._defining_module(fn, str(link))
    assert (rel, mod) == (direct_rel, direct_mod)

    # a repo that does NOT contain the source: unlocatable -> the
    # refresh hold treats it as edited (fail closed)
    rel2, _ = pw._defining_module(fn, str(tmp_path / "elsewhere"))
    assert rel2 is None
    assert pw.attestation_input_files(
        spec, str(tmp_path / "elsewhere")
    ) == set()
