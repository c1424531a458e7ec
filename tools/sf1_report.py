#!/usr/bin/env python3
"""Dev-only: assemble BENCH_SF1_FULL_r{N}.json from a full Bench run on the
10x ScaleUp corpus plus the same-round sf0.1 floor artifact.

NOT part of the engine. Slope = sf1_seconds / sf0.1_floor_seconds per query,
reported only where the sf0.1 floor exceeds a fixed-cost cutoff (0.3 s) so
JVM fixed costs don't masquerade as scale slopes.

Usage: python3 tools/sf1_report.py <bench_sf1.json> <floor_sf01.json> <out.json>
"""
import json
import sys

bench, floor, out = sys.argv[1], sys.argv[2], sys.argv[3]
b = json.load(open(bench))
f = json.load(open(floor))
qb, qf = b["queries"], f["queries"]
slopes = {}
for k, v in qb.items():
    fv = qf.get(k)
    if isinstance(v, (int, float)) and isinstance(fv, (int, float)) and fv > 0.3:
        slopes[k] = round(v / fv, 2)
vals = sorted(slopes.values())
n = len(vals)
doc = {
    "metric": "sf1_full_suite",
    "unit": "sec",
    "datagen": "graft.tools.ScaleUp 10x corpus from /root/testdata/sf0.1",
    "sf1_total": b["value"],
    "sf1_raw_total": b.get("raw_total"),
    "sf01_floor_total": f["value"],
    "queries_sf1": qb,
    "failures": b["failures"],
    "calib": {
        "eff_cores": [b["eff_cores_start"], b["eff_cores_end"]],
        "contended": b["contended"],
    },
    "slope_stats": {
        "n": n,
        "median": vals[n // 2] if n else None,
        "p90": vals[int(n * 0.9)] if n else None,
        "max": vals[-1] if n else None,
    },
    "slope_10x_data": dict(sorted(slopes.items(), key=lambda x: -x[1])),
}
json.dump(doc, open(out, "w"), indent=None)
print(f"{out}: total={b['value']} floor={f['value']} "
      f"median_slope={doc['slope_stats']['median']} "
      f"p90={doc['slope_stats']['p90']} max={doc['slope_stats']['max']}")
