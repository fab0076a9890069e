#!/usr/bin/env python3
"""Generate the ENVELOPE baseline-vs-Spark table FROM a BENCH_FULL_r{N}.json.

Companion to envelope_scale.py: the envelope's numbers must be a pure
function of committed artifacts, not retyped prose. Baselines are the
BASELINE.md pandas measurements (fixed since round 1).

Usage: python3 dev/envelope_bench.py BENCH_FULL_r8.json
Dev-only tooling — the shipped library never depends on this.
"""
import json
import sys

# BASELINE.md sf0.1 pandas numbers (v6 is sf0.01 — quadratic, sf0.1 infeasible)
BASELINES = [
    ("sdc_suppress (v1)", "v1_sdc_suppress", 0.091),
    ("generalize (v2)", "v2_generalize", 0.414),
    ("dp_noise (v3)", "v3_dp_noise", 0.077),
    ("basic_stats (a1)", "a1_profile_lineitem", 1.069),
    ("distribution_drift (d3)", "d3_drift_all", 6.524),
    ("smart_suggest (v5)", "v5_smart_suggest", 0.097),
    ("synthetic (v4)", "v4_synthetic", 0.144),
]


def main():
    d = json.load(open(sys.argv[1]))
    qs = d["queries"]
    print("| op | baseline (pandas) | Spark | ratio |")
    print("|---|---|---|---|")
    tot_b = tot_s = 0.0
    for label, key, b in BASELINES:
        s = qs[key]
        tot_b += b
        tot_s += s
        print(f"| {label} | {b:.3f} | {s:.3f} | {s / b:.2f}× |")
    print(f"| knn_linkage_risk (v6) | 57.9 @sf0.01 | "
          f"{qs['v6_linkage_risk']:.3f} @sf0.1 | 0.02× |")
    print()
    print(f"Comparable-set totals (excl. v6): pandas {tot_b:.2f} s vs Spark "
          f"{tot_s:.2f} s = **{tot_s / tot_b:.2f}× aggregate**.")
    print(f"Full catalog: {len(qs)} queries, {d['value']:.1f} s total, "
          f"failed = {d['failed']}, runs = {d['runs']}.")
    if "scaleup" in d:
        s = d["scaleup"]
        print(f"x{s['copies']} scaleup (bench pass): total ratio "
              f"{s['ratio']:.2f} over {len(s['queries'])} headline queries.")


if __name__ == "__main__":
    main()
