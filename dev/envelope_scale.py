#!/usr/bin/env python3
"""Generate the ENVELOPE scale section FROM a SCALE_r{N}.json artifact.

Round-7 verdict finding #4: the hand-written envelope under-reported its
own data (listed a subset of the >8 ratios). This script makes the
narrative a pure function of the artifact: every query, sorted by ratio
descending, with EVERY ratio above the flag threshold called out.

Usage: python3 dev/envelope_scale.py SCALE_r8.json [flag_threshold=8]
Dev-only tooling — the shipped library never depends on this.
"""
import json
import sys


def main():
    path = sys.argv[1]
    flag = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    d = json.load(open(path))
    copies = d["copies"]
    qs = d["queries"]
    rows = sorted(qs.items(), key=lambda kv: -kv[1]["ratio"])
    over = [(k, v) for k, v in rows if v["ratio"] > flag]
    print(f"## Scale rehearsal (x{copies}) — generated from {path}")
    print()
    print(f"Headline set: {len(rows)} queries; total base "
          f"{d['total_base']:.2f} s, x{copies} {d[f'total_x{copies}']:.2f} s, "
          f"**total ratio {d['total_ratio']:.2f}** (linear = {copies}).")
    print()
    if over:
        print(f"**Every ratio > {flag:g}** (none omitted):")
        for k, v in over:
            print(f"- `{k}`: {v['base']:.2f} s → {v[f'x{copies}']:.2f} s, "
                  f"ratio {v['ratio']:.2f}")
    else:
        print(f"**No query exceeds ratio {flag:g}.**")
    print()
    print(f"| query | base s | x{copies} s | ratio |")
    print("|---|---|---|---|")
    for k, v in rows:
        mark = " ⚠" if v["ratio"] > flag else ""
        print(f"| {k}{mark} | {v['base']:.2f} | {v[f'x{copies}']:.2f} | "
              f"{v['ratio']:.2f} |")


if __name__ == "__main__":
    main()
