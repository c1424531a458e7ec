#!/usr/bin/env python3
"""Dev/round tooling: merge a 4-core and a 32-core Bench artifact into the
per-round BENCH_CORES_r{N}.json serial-stage probe (round-8 found the
imageio-registry lock this way; round 9 institutionalizes it).

A query whose wall time barely improves from 4 to 32 cores (ratio
four_core/thirty_two_core ~ 1.0) above a wall floor is hiding a serial
stage — a driver-side loop, a JVM-global lock, or a single-partition plan.

Usage: python3 tools/cores_report.py BENCH_4.json BENCH_32.json OUT.json \
           [BASELINE.json]
With a BASELINE (the previous round's committed artifact), exit 1 only on
NEW entrants to flagged_serial — the adjudicated standing set (iterative /
driver-coordinated trainers whose cost is sequential JOB latency, not
serial CPU; stage probes show wide tasks with run >> wall) stays flagged
for visibility without failing the check. Without a baseline, exit 1 if
anything is flagged.
"""
import json
import sys

# Below this 4-core wall (seconds) the time is fixed cost, not compute —
# the ratio carries no parallelism signal. Override with GRAFT_WALL_FLOOR:
# the right floor scales with the corpus (at sf1 a 2-6 s query is still
# mostly per-stage fixed cost + exchange latency, and a hypervisor
# throttled to ~20/32 effective cores caps even perfect scaling at ~5x —
# round-11 used 8.0 at sf1 so only queries with real compute are judged).
import os
WALL_FLOOR = float(os.environ.get("GRAFT_WALL_FLOOR", "2.0"))
# 4-core/32-core speedup below this flags a serial stage. Perfect scaling
# reads ~8; shuffle/fixed overhead typically lands 2-6; a serial stage ~1.
MIN_SPEEDUP = 1.5


def qtimes(path):
    d = json.load(open(path))
    out = {k: float(v) for k, v in (d.get("queries") or {}).items()
           if isinstance(v, (int, float))}
    for k, v in (d.get("rerun") or {}).items():
        if k in out:
            out[k] = min(out[k], float(v))
    return d, out


def main():
    p4, p32, outp = sys.argv[1], sys.argv[2], sys.argv[3]
    d4, q4 = qtimes(p4)
    d32, q32 = qtimes(p32)
    rows = {}
    flagged = []
    for k in sorted(set(q4) & set(q32)):
        ratio = q4[k] / q32[k] if q32[k] > 0 else float("inf")
        rows[k] = {"t4": round(q4[k], 3), "t32": round(q32[k], 3),
                   "speedup": round(ratio, 2)}
        if q4[k] >= WALL_FLOOR and ratio < MIN_SPEEDUP:
            flagged.append(k)
    report = {
        "wall_floor_sec": WALL_FLOOR, "min_speedup": MIN_SPEEDUP,
        "contended_4": d4.get("contended"), "contended_32": d32.get("contended"),
        "eff_cores_4": [d4.get("eff_cores_start"), d4.get("eff_cores_end")],
        "eff_cores_32": [d32.get("eff_cores_start"), d32.get("eff_cores_end")],
        "sf": d32.get("sf"), "flagged_serial": sorted(flagged),
        "queries": rows,
    }
    baseline = set()
    if len(sys.argv) > 4:
        baseline = set(json.load(open(sys.argv[4])).get("flagged_serial", []))
        report["baseline_flagged"] = sorted(baseline)
    new = sorted(set(flagged) - baseline)
    report["new_serial"] = new
    with open(outp, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"{len(rows)} queries compared, {len(flagged)} flagged serial: "
          f"{sorted(flagged)}")
    if baseline or len(sys.argv) > 4:
        print(f"new vs baseline: {new}")
        sys.exit(1 if new else 0)
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
