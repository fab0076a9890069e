#!/usr/bin/env python3
"""Parse `runMain graft.DevScaleUp` stdout into a SCALE_r{N}.json artifact.

Usage: python3 dev/scale_json.py <devscaleup.log> <copies> <sfDir> <out.json> [note]
Dev-only tooling — the shipped library never depends on this.
"""
import json
import re
import sys


def main():
    log, copies, sfdir, out = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
    note = sys.argv[5] if len(sys.argv) > 5 else ""
    queries = {}
    total = None
    pat = re.compile(
        r"\[scaleup\] (\S+)\s+base\s+([0-9.]+)\s+x(\d+)\s+([0-9.]+)\s+ratio\s+([0-9.]+)")
    tot = re.compile(
        r"\[scaleup\] TOTAL base ([0-9.]+) x(\d+) ([0-9.]+) ratio ([0-9.]+)")
    for line in open(log):
        m = pat.search(line)
        if m and m.group(1) != "TOTAL":
            queries[m.group(1)] = {
                "base": float(m.group(2)),
                f"x{m.group(3)}": float(m.group(4)),
                "ratio": float(m.group(5)),
            }
        t = tot.search(line)
        if t:
            total = (float(t.group(1)), float(t.group(3)), float(t.group(4)))
    assert queries and total, "no scaleup lines parsed"
    doc = {
        "copies": copies,
        "sf": sfdir,
        "linear_ratio": float(copies),
        "total_base": total[0],
        f"total_x{copies}": total[1],
        "total_ratio": total[2],
        "method": ("graft.DevScaleUp: headline set, plans precompiled at base, "
                   "fully-materialized InternalRow execution behind per-query GC "
                   "barriers (Bench.timed); fixture = key-offset copies with "
                   "per-copy doc markers AND disjoint per-copy user populations "
                   "(ScaleUp.ensure docmark-v3)"),
        "note": note,
        "queries": queries,
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(queries)} queries, total ratio {total[2]}")


if __name__ == "__main__":
    main()
