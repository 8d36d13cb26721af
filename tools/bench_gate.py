#!/usr/bin/env python3
"""Per-query bench regression gate.

Diffs a bench_results/*.json record (written by graft.Bench's final
emit) against BASELINE.json's recorded per-query map and fails if any
query exceeds RATIO x its baseline time. Run as part of the round-close
drill so a slow regression in one query can't hide inside a flat total
(the total has ~2.7x headroom vs the driver's 2x gate, enough to absorb
a 10x single-query regression silently).

Usage:
  python3 tools/bench_gate.py bench_results/r12.json [--baseline BASELINE.json]
      [--ratio 1.5] [--floor 1.0]

`--floor` (seconds) exempts sub-second queries: at sf0.1 their times are
dominated by fixed job-submission overhead and jitter, so a 0.2 s ->
0.35 s wobble is noise, not a plan regression. A query must exceed BOTH
ratio x baseline AND the floor to fail the gate.

MACHINE-SPEED NORMALIZATION: the per-query threshold is
ratio x median(run ratio), not a raw ratio. A shared-host VM can run a
whole pass 10-20% slower than the baseline run did (observed r13:
best_total 397 -> 484 s across four runs of near-identical code), and
with a raw threshold each such pass flags a DIFFERENT random 1-2 s
query at ~1.5x - pure noise. Dividing out the run's median ratio makes
the test "did THIS query regress relative to everything else this
run", which is what a plan regression looks like. A genuinely global
regression cannot hide in the median: the gate fails outright if the
median ratio exceeds --median-cap (default 1.3), and the driver's own
2x best_total contract backstops it independently.

Exit 0 = gate passed (regressions list empty). Exit 1 = regressions or
bench-side failures present. New queries (no baseline entry) are
reported informationally and do not fail the gate.
"""
import argparse
import json
import statistics
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", help="bench_results/rN.json from graft.Bench")
    ap.add_argument("--baseline", default="BASELINE.json")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=1.0)
    ap.add_argument("--median-cap", type=float, default=1.3,
                    help="fail outright if the run's median per-query "
                         "ratio vs baseline exceeds this (global "
                         "regression / unusable machine)")
    ap.add_argument("--hard-ratio", type=float, default=2.5,
                    help="absolute per-query backstop independent of the "
                         "median normalization: a raw ratio above this "
                         "(and above the floor) always fails, so a large "
                         "single-query regression cannot ride a slow run "
                         "(ADVICE r13: median*ratio could reach ~1.95x)")
    args = ap.parse_args()

    with open(args.bench) as f:
        bench = json.load(f)
    if bench.get("subset"):
        # a SPARK_GRAFT_BENCH_ONLY one-off re-time, not a full suite —
        # gating it would report every other query "missing"
        print("ERROR: bench record is a subset run (SPARK_GRAFT_BENCH_ONLY)"
              " — cannot gate")
        sys.exit(1)
    with open(args.baseline) as f:
        base = json.load(f)
    # Prefer the ratcheted gate_baseline (latest green full-drill record,
    # e.g. r12's 431 s map) over recorded_baseline (the r11 649 s map that
    # stays frozen as the driver's 2x contract denominator). Without the
    # ratchet, a 28x single-query revert (sim_pca 0.25 s -> 7 s) would
    # still pass against the stale map.
    gate = base.get("gate_baseline")
    if gate and gate.get("queries"):
        src = "gate_baseline r%s" % gate.get("recorded_round")
    else:
        gate = base.get("recorded_baseline", base)
        src = "recorded_baseline"
    base_q = gate.get("queries", {})
    if not base_q:
        # refusing to "pass" against nothing: an empty map would class
        # every query NEW and wave a full revert through
        print("ERROR: baseline query map is empty — cannot gate")
        sys.exit(1)
    cur = bench.get("best", bench.get("queries", {}))

    ratios = [t / base_q[n] for n, t in cur.items()
              if n in base_q and t >= 0 and base_q[n] > 0]
    med = statistics.median(ratios) if ratios else 1.0
    # never let a FAST run tighten the effective threshold below the
    # configured ratio: queries near the floor wobble in absolute terms
    # regardless of how quick the machine is
    limit = args.ratio * max(med, 1.0)

    regressions, news, improved = [], [], 0
    for name, t in sorted(cur.items()):
        if t < 0:
            regressions.append((name, t, base_q.get(name), "FAILED in bench"))
            continue
        b = base_q.get(name)
        if b is None:
            news.append((name, t))
            continue
        if t > args.floor and (t > b * limit or t > b * args.hard_ratio):
            why = f"{t / b:.2f}x baseline ({t / b / med:.2f}x median-relative)"
            if t > b * args.hard_ratio:
                why += f" [exceeds hard backstop {args.hard_ratio}x]"
            regressions.append((name, t, b, why))
        elif t < b:
            improved += 1

    missing = sorted(set(base_q) - set(cur))
    for name in missing:
        regressions.append((name, None, base_q[name], "missing from bench record"))

    print(f"gate: {len(cur)} queries, ratio {args.ratio}, floor {args.floor}s, "
          f"baseline = {src} ({len(base_q)} queries)")
    print(f"  median run ratio vs baseline: {med:.3f} "
          f"(per-query threshold {limit:.2f}x, hard backstop "
          f"{args.hard_ratio}x)")

    # Host-speed canary cross-check (graft.Bench records a fixed synthetic
    # CPU workload before/after the suite). If the run's median ratio is
    # elevated but the canary says the host was NOT correspondingly slow,
    # the slowdown is in the code, not the machine — exactly the global
    # regression the median normalization could otherwise absorb.
    cans = [bench.get("canary_before_s", -1), bench.get("canary_after_s", -1)]
    cans = [c for c in cans if isinstance(c, (int, float)) and c > 0]
    base_can = gate.get("canary_s")
    if cans:
        host = min(cans)
        line = f"  host canary: {host:.3f}s (before/after min)"
        if isinstance(base_can, (int, float)) and base_can > 0:
            cr = host / base_can
            line += f", {cr:.3f}x baseline canary {base_can:.3f}s"
            print(line)
            if med > 1.15 and med > cr + 0.15:
                # ENFORCED, not advisory: a uniform code-level slowdown
                # under the 1.3 median-cap used to pass (med also
                # inflates every per-query threshold); the canary proves
                # the host was not correspondingly slow, so the slowdown
                # is in the code
                print(f"  GLOBAL CODE SLOWDOWN: median ratio {med:.3f} is "
                      f"not explained by host speed (canary ratio "
                      f"{cr:.3f}) — failing the gate")
                sys.exit(1)
        else:
            print(line + " (no baseline canary recorded yet)")
    else:
        print("  host canary: not present in bench record")
    if med > args.median_cap:
        print(f"  GLOBAL REGRESSION: median ratio {med:.3f} exceeds "
              f"--median-cap {args.median_cap} — a code-level slowdown "
              f"cannot hide in normalization")
        sys.exit(1)
    print(f"  improved vs baseline: {improved}")
    for name, t in news:
        print(f"  NEW (no baseline): {name} = {t:.3f}s")
    if regressions:
        print(f"  REGRESSIONS ({len(regressions)}):")
        for name, t, b, why in regressions:
            ts = "n/a" if t is None else f"{t:.3f}s"
            bs = "n/a" if b is None else f"{b:.3f}s"
            print(f"    {name}: {ts} vs baseline {bs} — {why}")
        sys.exit(1)
    print("  GATE PASSED: no per-query regression")


if __name__ == "__main__":
    main()
