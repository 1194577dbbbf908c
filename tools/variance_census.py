#!/usr/bin/env python3
"""Same-code draw-variance census over BENCH_DETAIL artifacts
(VERDICT r11 Next #5, regenerated per round — VERDICT r12 Next #2).

Round 11 recorded four full-sweep draws of IDENTICAL code whose totals
spread 437-486 s; the attribution ("pure draw variance") lived in prose.
This tool makes that evidence a committed artifact: for every workload
present in ALL draws it records min/max/spread and a `flag_risk` score —
max / (2*min + 0.5), i.e. how close historical same-code draws alone come
to tripping bench_gate's 2x + 0.5 s band (risk >= 1 means two honest draws
of the same code could flag each other).

Outputs BENCH_VARIANCE.json:
  draws:        the refs/files used, with totals and calibration probes
  workloads:    {name: {min, max, spread, risk}}
  top_variance: the 10 highest-risk workloads PLUS the full q_stream_*
                family and q_cc_incremental (VERDICT r12 Next #2: the
                streaming rows are where the mid-sweep degradation
                lands, and q_cc_incremental is the standing watch item)
                — Bench.scala gives exactly these a third timed pass
                (min-of-3); bench_gate.py gates flagged members against
                their envelope.

Envelope staleness contract (ADVICE r12): bench_gate only lets an
envelope downgrade a flag when the BASELINE time also lies inside the
envelope — an envelope from draws of code the baseline has since beaten
stops speaking. Regenerate this census whenever a round commits >= 2
same-code full-sweep draws.

Usage:
  python3 tools/variance_census.py                 # default r12 draw refs
  python3 tools/variance_census.py REF_OR_FILE ... # explicit commits/files
"""
import json
import os
import subprocess
import sys

# the round-14 same-code 404-workload full-sweep draws (BUILDER_NOTES
# "Round-14 close"): draw 2 = 679.4 s at calib_cpu 1.030 (committed as
# the gate baseline), draw 3 = 724.2 s at 1.329 (5bd5f02), draw 4 =
# 721.4 s at 1.187 (4f539a4) — the FIRST census with >= 3 draws, which
# arms bench_gate's envelope-tighten rule (ADVICE r13), and the first
# under the adaptive-pass-2 harness (most reads single-draw, so the
# envelopes carry the honest single-draw spread the gate will see)
# all three refs are IMMUTABLE SHAs (ADVICE r14: "HEAD" silently moved
# with every new commit, so regenerated envelopes drifted from the
# documented draw set): 1b1e544 is the commit that recorded draw 2 / the
# committed gate baseline.
# round-15 same-code full-sweep draws at the optimization-round close
# (OPTIMIZATION_r15.md close-out): draw 1 = 618.6 s at calib_cpu 1.195
# (74987a5), draw 2 = 596.0 s at 1.219 (7b26b1d), draw 3 = 577.1 s at
# 0.985 (7b96d7d, the committed gate baseline). All immutable SHAs; the
# r14 envelopes are retired — 115 of them had gone stale against the
# optimized baseline (bench_gate "STALE ENVELOPES" at the r15 close).
DEFAULT_REFS = ["74987a5", "7b26b1d", "7b96d7d"]


def load_ref(ref):
    """A ref is either a path to a BENCH_DETAIL-shaped file or a commit."""
    if os.path.isfile(ref):
        with open(ref) as f:
            return json.load(f)
    out = subprocess.check_output(["git", "show", f"{ref}:BENCH_DETAIL.json"])
    return json.loads(out)


def main(argv):
    refs = argv[1:] if len(argv) > 1 else DEFAULT_REFS
    draws = [(r, load_ref(r)) for r in refs]
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

    by_risk = sorted(workloads, key=lambda n: -workloads[n]["risk"])
    pinned = list(by_risk[:10])
    # the min-of-3 family extension (VERDICT r12 Next #2)
    for n in sorted(workloads):
        if (n.startswith("q_stream") or n == "q_cc_incremental") \
                and n not in pinned:
            pinned.append(n)
    out = {
        # bench_gate disarms its envelope-TIGHTEN rule below 3 draws
        # (ADVICE r13: two-draw envelopes underestimate true spread)
        "n_draws": len(draws),
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
        "top_variance": pinned,
    }
    with open("BENCH_VARIANCE.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")

    risky = [n for n in workloads if workloads[n]["risk"] >= 1.0]
    print(f"census over {len(draws)} draws, {len(common)} common workloads")
    print(f"workloads whose historical draws alone could trip the gate "
          f"(risk >= 1): {len(risky)}")
    print(f"pinned (min-of-3) set: {len(pinned)} "
          f"(top-10 risk + streaming family + q_cc_incremental)")
    print(f"{'workload':<28}{'min_s':>8}{'max_s':>8}{'spread':>8}{'risk':>7}")
    for n in by_risk[:10]:
        w = workloads[n]
        print(f"{n:<28}{w['min']:>8.2f}{w['max']:>8.2f}"
              f"{w['spread']:>8.2f}{w['risk']:>7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
