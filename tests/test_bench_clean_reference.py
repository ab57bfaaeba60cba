"""bench.py's clean-regime sibling table (VERDICT r11 ask #2).

The driver's committed BENCH reading has been warm/loaded three rounds
running, so per-query cross-round deltas off it compare incompatible
regimes.  ``_clean_reference`` folds the round's committed clean-box
artifacts into per-query MINs that ride along in the committed artifact;
these tests pin its selection rules.
"""

from __future__ import annotations

import json

import bench


def _write(d, name, *, loaded=False, sf=0.1, queries=None):
    (d / name).write_text(
        json.dumps({"loaded_box": loaded, "sf": sf, "queries": queries or {}})
    )


def test_min_over_latest_round_clean_runs_only(tmp_path):
    """Only the HIGHEST round tag contributes (a faster OLD plan must
    not shadow the shipped one); loaded and wrong-sf runs are ignored;
    per-query values are MINs across the qualifying runs."""
    _write(tmp_path, "BENCH_r11_cleanbox.json",
           queries={"join_inner": 0.1, "q1_pricing_summary": 0.2})
    _write(tmp_path, "BENCH_r12_cleanbox.json",
           queries={"join_inner": 0.5, "q1_pricing_summary": 0.9})
    _write(tmp_path, "BENCH_r12_cleanbox_run2.json",
           queries={"join_inner": 0.7, "q1_pricing_summary": 0.6})
    _write(tmp_path, "BENCH_r12_cleanbox_loaded.json", loaded=True,
           queries={"join_inner": 0.01})
    _write(tmp_path, "BENCH_r12_cleanbox_sf001.json", sf=0.01,
           queries={"join_inner": 0.02})

    ref = bench._clean_reference(str(tmp_path), 0.1)
    assert ref["queries"] == {"join_inner": 0.5, "q1_pricing_summary": 0.6}
    assert ref["n_runs"] == 2
    assert set(ref["sources"]) == {
        "BENCH_r12_cleanbox.json", "BENCH_r12_cleanbox_run2.json"
    }
    # subtotal sums only the frozen r01 surface names
    assert ref["subtotal_r01_surface"] == round(0.5 + 0.6, 3)


def test_this_run_folds_in_when_clean(tmp_path):
    _write(tmp_path, "BENCH_r12_cleanbox.json", queries={"join_inner": 0.5})
    ref = bench._clean_reference(
        str(tmp_path), 0.1, this_run={"join_inner": 0.3, "join_left": 0.4}
    )
    assert ref["queries"] == {"join_inner": 0.3, "join_left": 0.4}
    assert "this_run" in ref["sources"]


def test_no_clean_runs_yields_none_or_this_run_only(tmp_path):
    assert bench._clean_reference(str(tmp_path), 0.1) is None
    ref = bench._clean_reference(str(tmp_path), 0.1, this_run={"a": 1.0})
    assert ref["sources"] == ["this_run"]


def test_repo_artifacts_produce_a_reference():
    """The shipped bench_artifacts/ always yields a clean reference at
    sf0.1 — the committed artifact can never silently drop the field."""
    import os

    ref = bench._clean_reference(
        os.path.join(os.path.dirname(bench.__file__), "bench_artifacts"),
        0.1,
    )
    assert ref is not None
    assert ref["n_runs"] >= 1
    assert ref["subtotal_r01_surface"] > 0


def test_digest_matching_artifacts_beat_round_tag(tmp_path):
    """Plan-digest selection (r12): an artifact whose plan_digest
    matches the live tree is preferred over a HIGHER round tag without
    one — the round-tag fallback cannot protect against mid-round plan
    rewrites, the digest can (same digest == same plans by
    construction)."""
    import json as _json

    (tmp_path / "BENCH_r12_cleanbox.json").write_text(_json.dumps({
        "loaded_box": False, "sf": 0.1, "plan_digest": "LIVE",
        "queries": {"join_inner": 0.9},
    }))
    (tmp_path / "BENCH_r13_cleanbox.json").write_text(_json.dumps({
        "loaded_box": False, "sf": 0.1,  # no digest: pre-rewrite plans
        "queries": {"join_inner": 0.1},
    }))
    ref = bench._clean_reference(str(tmp_path), 0.1, digest="LIVE")
    assert ref["digest_match"] is True
    assert ref["sources"] == ["BENCH_r12_cleanbox.json"]
    assert ref["queries"] == {"join_inner": 0.9}  # old 0.1 NOT folded


def test_digest_mismatch_falls_back_to_round_tag_and_says_so(tmp_path):
    _write(tmp_path, "BENCH_r12_cleanbox.json", queries={"join_inner": 0.5})
    ref = bench._clean_reference(str(tmp_path), 0.1, digest="LIVE")
    assert ref["digest_match"] is False
    assert ref["sources"] == ["BENCH_r12_cleanbox.json"]
    # ... but a clean live run restores trust: this_run IS the live tree
    ref2 = bench._clean_reference(
        str(tmp_path), 0.1, this_run={"join_inner": 0.4}, digest="LIVE"
    )
    assert ref2["digest_match"] is False  # folded sources still mixed
    assert "this_run" in ref2["sources"]


def test_repo_artifacts_match_live_digest():
    """The committed r12 clean-box artifacts are stamped with the live
    tree's plan digest — a plan rewrite without a fresh clean-box run
    flips this, which is exactly the signal to re-measure."""
    import os

    ref = bench._clean_reference(
        os.path.join(os.path.dirname(bench.__file__), "bench_artifacts"),
        0.1,
        digest=bench._plan_digest(),
    )
    assert ref is not None and ref["digest_match"] is True
