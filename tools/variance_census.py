#!/usr/bin/env python3
"""Same-code draw-variance census over committed BENCH_DETAIL artifacts
(VERDICT r11 Next #5).

Round 11 recorded four full-sweep draws of IDENTICAL code for the common
workloads (the round's waves were additive) whose totals spread 437-486 s;
the attribution ("pure draw variance") lived in prose. This tool makes that
evidence a committed artifact: for every workload present in ALL draws it
records min/max/spread and a `flag_risk` score — max / (2*min + 0.5), i.e.
how close historical same-code draws alone come to tripping bench_gate's
2x + 0.5 s band (risk >= 1 means two honest draws of the same code could
flag each other).

Outputs BENCH_VARIANCE.json:
  draws:        the refs used, with totals and calibration probes
  workloads:    {name: {min, max, spread, risk}}
  top_variance: the 10 highest-risk workloads — Bench.scala gives exactly
                these a third timed pass (min-of-3); bench_gate.py quotes
                the envelope for any flagged member.

Usage:
  python3 tools/variance_census.py                 # default r11 draw refs
  python3 tools/variance_census.py REF [REF ...]   # explicit commits
"""
import json
import subprocess
import sys

# the four round-11 same-code full-sweep draws (BUILDER_NOTES "Round 11,
# close": totals 437.4 / 461.3 / 486.5 / 461.2 s)
DEFAULT_REFS = ["bffd17c", "ec4412a", "09ac8a2", "8ebd70d"]


def load_git(ref):
    out = subprocess.check_output(["git", "show", f"{ref}:BENCH_DETAIL.json"])
    return json.loads(out)


def main(argv):
    refs = argv[1:] if len(argv) > 1 else DEFAULT_REFS
    draws = [(r, load_git(r)) for r in refs]
    common = set(draws[0][1]["queries"])
    for _, d in draws[1:]:
        common &= set(d["queries"])

    workloads = {}
    for name in sorted(common):
        ts = [d["queries"][name] for _, d in draws]
        lo, hi = min(ts), max(ts)
        workloads[name] = {
            "min": round(lo, 3),
            "max": round(hi, 3),
            "spread": round(hi / lo, 3) if lo > 0 else -1.0,
            "risk": round(hi / (2 * lo + 0.5), 3),
        }

    top = sorted(workloads, key=lambda n: -workloads[n]["risk"])[:10]
    out = {
        "draws": [
            {
                "ref": r,
                "total": d["value"],
                "n_queries": d["n_queries"],
                "calib_cpu_s": d["calib_cpu_s"],
                "calib_fs_s": d["calib_fs_s"],
            }
            for r, d in draws
        ],
        "n_common": len(common),
        "workloads": workloads,
        "top_variance": top,
    }
    with open("BENCH_VARIANCE.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")

    risky = [n for n in workloads if workloads[n]["risk"] >= 1.0]
    print(f"census over {len(draws)} draws, {len(common)} common workloads")
    print(f"workloads whose historical draws alone could trip the gate "
          f"(risk >= 1): {len(risky)}")
    print(f"{'workload':<28}{'min_s':>8}{'max_s':>8}{'spread':>8}{'risk':>7}")
    for n in top:
        w = workloads[n]
        print(f"{n:<28}{w['min']:>8.2f}{w['max']:>8.2f}"
              f"{w['spread']:>8.2f}{w['risk']:>7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
