#!/usr/bin/env python3
"""Bench regression gate (VERDICT r9 Next #3; per-workload envelopes
VERDICT r12 Next #2).

Diffs a fresh BENCH_DETAIL.json against the last COMMITTED one (default:
`git show HEAD:BENCH_DETAIL.json`), calibration-normalized, and flags
regressions. The r9 drift slipped through because mid-session diffs
compared session-to-session instead of against the committed artifact -
this tool only ever compares against a committed baseline.

Normalization: each side's times divide by that run's calib_cpu_s (the
pure-codegen CPU probe) and, separately, by calib_fs_s (the pinned parquet
scan probe). A workload is flagged only if BOTH normalized ratios exceed
the band - a query that looks slow raw but is explained by either probe
(box-wide CPU contention or FS band) is not a regression.

Per-workload envelopes (BENCH_VARIANCE.json, tools/variance_census.py over
the committed same-code r12 draws) refine the flat 2x + 0.5 s band in BOTH
directions:
  - DOWNGRADE: a flat-band flag whose fresh time still sits inside the
    workload's same-code envelope is draw variance, warned not failed -
    but ONLY when the baseline time also lies inside the envelope
    (ADVICE r12: an envelope from draws the current code has since beaten
    is STALE and stops speaking; stale envelopes are reported).
  - TIGHTEN: an envelope member whose fresh time exceeds
    ENV_MARGIN * env.max (+ the abs floor) is flagged even if the flat
    band missed it because the baseline happened to be drawn high.

Usage:
  python3 tools/bench_gate.py                      # fresh BENCH_DETAIL.json vs HEAD
  python3 tools/bench_gate.py FRESH BASELINE       # explicit files
  python3 tools/bench_gate.py --ref e2dba3a        # fresh vs that commit's artifact

Exit 1 if any workload is flagged (close-checklist wiring).
"""
import json
import subprocess
import sys

BAND_RATIO = 2.0
BAND_ABS = 0.5   # seconds
ENV_MARGIN = 1.5  # fresh > 1.5 * same-code envelope max => flag


def load(path):
    with open(path) as f:
        return json.load(f)


def load_git(ref):
    out = subprocess.check_output(["git", "show", f"{ref}:BENCH_DETAIL.json"])
    return json.loads(out)


def main(argv):
    rest = argv[1:]
    ref = "HEAD"
    if "--ref" in rest:
        i = rest.index("--ref")
        ref = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
    args = [a for a in rest if not a.startswith("--")]
    fresh = load(args[0] if args else "BENCH_DETAIL.json")
    base = load(args[1]) if len(args) > 1 else load_git(ref)

    fq, bq = fresh["queries"], base["queries"]
    common = sorted(set(fq) & set(bq))
    missing = sorted(set(bq) - set(fq))
    added = sorted(set(fq) - set(bq))

    def norm_ratios(name):
        raw = fq[name] / bq[name] if bq[name] > 0 else float("inf")
        # scale the fresh time into the baseline run's environment
        cpu = raw * base["calib_cpu_s"] / fresh["calib_cpu_s"] \
            if fresh["calib_cpu_s"] > 0 else raw
        fs = raw * base["calib_fs_s"] / fresh["calib_fs_s"] \
            if fresh["calib_fs_s"] > 0 else raw
        return raw, cpu, fs

    try:
        with open("BENCH_VARIANCE.json") as f:
            census = json.load(f)["workloads"]
    except (OSError, ValueError, KeyError):
        census = {}

    # Environment scale for the ENVELOPE comparison: envelopes are RAW
    # seconds from census-era draws, and the baseline (guarded to lie
    # inside the envelope) shares that era's environment — so a fresh
    # draw on a degraded box must scale the envelope by the more
    # generous calibration ratio before the tighten rule may fire
    # (round 13: a calib_fs 1.93x draw raw-flagged six store writes that
    # normalize to 1.2-1.75x, all inside the band).
    calib_ratio = max(
        fresh["calib_cpu_s"] / base["calib_cpu_s"] if base["calib_cpu_s"] > 0 else 1.0,
        fresh["calib_fs_s"] / base["calib_fs_s"] if base["calib_fs_s"] > 0 else 1.0)
    env_scale = max(calib_ratio, 1.0)
    # DOWNGRADE scale (ADVICE r13): on a box FASTER than the census era
    # (calib_ratio < 1) a genuine ~2x code regression can land back inside
    # the raw envelope — regression x faster-box cancels — so the envelope
    # SHRINKS by the unclamped ratio. On a slower box it stays raw
    # (min 1.0 cap): a waiver never widens with the environment.
    env_scale_dn = min(calib_ratio, 1.0)
    # TIGHTEN needs enough census draws to trust the envelope max: with
    # only two same-code draws the per-workload spread is badly
    # underestimated and 1.5x env.max false-flags honest draws (ADVICE
    # r13) — the rule disarms below three draws.
    n_draws = 0
    try:
        with open("BENCH_VARIANCE.json") as f:
            n_draws = json.load(f).get("n_draws", 0)
    except (OSError, ValueError):
        pass

    flagged = []
    variance_explained = []
    stale_envelopes = []
    rows = []
    for name in common:
        raw, cpu, fs = norm_ratios(name)
        bad = (min(cpu, fs) > BAND_RATIO
               and fq[name] - bq[name] > BAND_ABS)
        why = "band" if bad else ""
        env = census.get(name)
        # an envelope speaks for the current code only if the committed
        # baseline also lies inside it (ADVICE r12 staleness guard)
        env_live = env and bq[name] >= env["min"]
        if env and not env_live:
            stale_envelopes.append((name, bq[name], env["min"]))
        if env_live:
            if bad and fq[name] <= env["max"] * env_scale_dn:
                variance_explained.append(
                    (name, fq[name], env["min"], env["max"], env["spread"]))
                bad = False
                why = ""
            elif (not bad
                  and n_draws >= 3
                  and fq[name] > ENV_MARGIN * env["max"] * env_scale + BAND_ABS
                  and min(cpu, fs) > 1.0):
                # envelope-tightened flag: beyond every same-code draw by
                # 1.5x, not explained by either calibration probe
                bad = True
                why = f"envelope (max {env['max']:.2f}s over same-code draws)"
        rows.append((name, bq[name], fq[name], raw, cpu, fs, bad, why))
        if bad:
            flagged.append((name, why))

    ft, bt = sum(fq[n] for n in common), sum(bq[n] for n in common)
    print(f"baseline: n={len(bq)} calib_cpu={base['calib_cpu_s']:.3f} "
          f"calib_fs={base['calib_fs_s']:.3f} sf={base.get('sf')}")
    print(f"fresh:    n={len(fq)} calib_cpu={fresh['calib_cpu_s']:.3f} "
          f"calib_fs={fresh['calib_fs_s']:.3f} sf={fresh.get('sf')}")
    print(f"common workloads: {len(common)}  baseline_sum={bt:.1f}s "
          f"fresh_sum={ft:.1f}s  raw_ratio={ft / bt if bt else 0:.3f}")
    if missing:
        print(f"missing from fresh ({len(missing)}): {', '.join(missing[:10])}"
              + (" ..." if len(missing) > 10 else ""))
    if added:
        print(f"new in fresh ({len(added)}): {', '.join(added[:10])}"
              + (" ..." if len(added) > 10 else ""))

    rows.sort(key=lambda r: -r[3])
    show = [r for r in rows if r[6]] or rows[:10]
    hdr = f"{'workload':<28}{'base_s':>8}{'fresh_s':>9}{'raw':>7}{'cpuN':>7}{'fsN':>7}  flag"
    print("\n" + hdr)
    for name, b, f, raw, cpu, fs, bad, why in show:
        print(f"{name:<28}{b:>8.2f}{f:>9.2f}{raw:>7.2f}{cpu:>7.2f}{fs:>7.2f}"
              f"  {'REGRESSION [' + why + ']' if bad else ''}")

    if variance_explained:
        print(f"\nDRAW-VARIANCE ({len(variance_explained)} workload(s) "
              f"outside the band but inside their committed same-code "
              f"draw envelope, baseline also in-envelope — warned, not "
              f"failed):")
        for name, f, lo, hi, spread in variance_explained:
            print(f"  {name}: fresh {f:.2f}s within envelope "
                  f"[{lo:.2f}, {hi:.2f}]s (spread {spread:.2f}x)")
    if stale_envelopes:
        print(f"\nSTALE ENVELOPES ({len(stale_envelopes)} — baseline now "
              f"faster than the envelope min; these no longer downgrade "
              f"or tighten; regenerate tools/variance_census.py):")
        for name, b, lo in stale_envelopes[:10]:
            print(f"  {name}: baseline {b:.2f}s < envelope min {lo:.2f}s")
        if len(stale_envelopes) > 10:
            print(f"  ... and {len(stale_envelopes) - 10} more")
    if flagged:
        print(f"\nGATE FAIL: {len(flagged)} workload(s): "
              + ", ".join(f"{n} [{w}]" for n, w in flagged))
        return 1
    print(f"\nGATE OK: no workload outside the {BAND_RATIO}x + {BAND_ABS}s "
          f"calib-normalized band or its {ENV_MARGIN}x same-code envelope")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
