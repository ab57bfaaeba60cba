#!/usr/bin/env python
"""Fold-vs-fold comparison of clean-box bench artifacts: per-query MIN
over the digest-matched BEFORE artifacts vs the AFTER artifacts.

Usage: python scripts/fold_compare.py BEFORE_DIGEST AFTER_DIGEST [topN]

Pure observer over bench_artifacts/*.json.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def fold(digest: str) -> tuple[dict, list]:
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_artifacts")
    out: dict[str, float] = {}
    srcs = []
    for p in sorted(glob.glob(os.path.join(base, "BENCH_r1[0-9]*.json"))):
        try:
            d = json.load(open(p))
        except Exception:
            continue
        if d.get("plan_digest") != digest or d.get("sf") != 0.1:
            continue
        if d.get("loaded_box"):
            continue
        srcs.append(os.path.basename(p))
        for q, s in d["queries"].items():
            out[q] = min(out.get(q, float("inf")), s)
    return out, srcs


#: query paths touched by the r16 campaign (direct edits + every
#: consumer of the lsh banding pin) — used for the drift split below
TOUCHED = {
    "label_noise_knn", "target_encoding", "negative_sampling", "bigram_lm",
    "histogram_quantile", "anomaly_mad", "acf_lags", "dedup_minhash_pairs",
    "dedup_components", "dedup_cluster_stats", "dedup_threshold_sweep",
    "dedup_pipeline_e2e", "dedup_incremental", "dedup_lsh_verify",
    "dedup_containment", "minhash_band_recall", "retrieval_ndcg",
    "embedding_pq", "ann_tuning_curve", "rollup_incremental_twin",
    "stream_session_watermark", "stateful_stats_twin",
}


def main() -> None:
    bd, ad = sys.argv[1], sys.argv[2]
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    before, bs = fold(bd)
    after, as_ = fold(ad)
    print("before sources:", bs)
    print("after sources:", as_)
    common = sorted(set(before) & set(after))
    tb = sum(before[q] for q in common)
    ta = sum(after[q] for q in common)
    print(f"fold totals over {len(common)} queries: {tb:.1f} -> {ta:.1f}  ({ta / tb:.3f}x)")
    # drift split (the r15 verdict's accounting): the untouched-query
    # median ratio is the box-state factor; only the touched set's
    # movement beyond it is claimable
    ratios_unt = sorted(
        after[q] / before[q] for q in common if q not in TOUCHED and before[q] > 0
    )
    ratios_tch = sorted(
        after[q] / before[q] for q in common if q in TOUCHED and before[q] > 0
    )
    med_u = ratios_unt[len(ratios_unt) // 2]
    med_t = ratios_tch[len(ratios_tch) // 2] if ratios_tch else float("nan")
    sum_tb = sum(before[q] for q in TOUCHED if q in before)
    sum_ta = sum(after[q] for q in TOUCHED if q in after)
    print(
        f"untouched median ratio (box drift): {med_u:.3f} over {len(ratios_unt)} queries\n"
        f"touched median ratio: {med_t:.3f} over {len(ratios_tch)} queries "
        f"(fold sum {sum_tb:.1f} -> {sum_ta:.1f}); drift-adjusted touched "
        f"median {med_t / med_u:.3f}"
    )
    deltas = sorted(common, key=lambda q: after[q] - before[q])
    print("\nbiggest improvements (fold sec):")
    for q in deltas[:topn]:
        if after[q] < before[q] - 0.02:
            print(f"  {q:30s} {before[q]:6.3f} -> {after[q]:6.3f}  {after[q] / before[q]:.2f}")
    print("\nregressions > 15% and > 0.05s:")
    any_reg = False
    for q in reversed(deltas):
        if after[q] > before[q] * 1.15 and after[q] - before[q] > 0.05:
            print(f"  {q:30s} {before[q]:6.3f} -> {after[q]:6.3f}  {after[q] / before[q]:.2f}")
            any_reg = True
    if not any_reg:
        print("  (none)")


if __name__ == "__main__":
    main()
