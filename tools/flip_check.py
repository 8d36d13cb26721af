#!/usr/bin/env python3
"""Default-flip gate: may this A/B-measured change ship ON by default?

Round 16 shipped the scan fan-out default-on on the strength of a noisy
in-suite `median_pass_total` delta while the per-query best-time
geomean in the SAME two committed records said 0.836x — a measured
1.2x suite regression went out as an "optimization". This tool makes
the A/B discipline binding: a default flip is allowed only if the
per-query best-time geomean (treatment vs baseline, floor 0.1 s) is
>= 1.0, i.e. the treatment does not lose on the suite as a whole.

Usage:
  tools/flip_check.py bench_results/baseline.json bench_results/treatment.json
      [--floor 0.1] [--min-geomean 1.0]

Exit 0 = flip allowed. Exit 1 = flip DISALLOWED (geomean < min) or the
records are not comparable. Re-running it on r16's own pair fails:
  tools/flip_check.py bench_results/r16_baseline.json bench_results/r16_fanout.json
  -> geomean speedup 0.836 < 1.0: FLIP DISALLOWED
"""
import argparse
import json
import math
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline", help="bench record WITHOUT the change")
    ap.add_argument("treatment", help="bench record WITH the change")
    ap.add_argument("--floor", type=float, default=0.1,
                    help="clamp per-query times below this (seconds) so "
                         "sub-jitter queries cannot dominate the geomean")
    ap.add_argument("--min-geomean", type=float, default=1.0)
    ap.add_argument("--report-worst", type=int, default=10)
    args = ap.parse_args()

    base = json.load(open(args.baseline)).get("best", {})
    treat = json.load(open(args.treatment)).get("best", {})
    common = sorted(n for n in set(base) & set(treat)
                    if base[n] >= 0 and treat[n] >= 0)
    if len(common) < 10:
        print(f"ERROR: only {len(common)} comparable queries — records "
              "are not a usable A/B pair")
        sys.exit(1)
    missing = sorted((set(base) | set(treat)) - set(common))
    if missing:
        print(f"WARNING: {len(missing)} queries not in both records: "
              f"{', '.join(missing[:10])}{'...' if len(missing) > 10 else ''}")

    # speedup = base/treat: >1 means the treatment is faster
    speedups = {n: max(base[n], args.floor) / max(treat[n], args.floor)
                for n in common}
    geomean = math.exp(sum(math.log(s) for s in speedups.values())
                       / len(speedups))
    slower = sum(1 for s in speedups.values() if s < 1 / 1.1)
    faster = sum(1 for s in speedups.values() if s > 1.1)
    print(f"flip_check: {len(common)} common queries, floor {args.floor}s")
    print(f"  per-query best-time geomean speedup (treatment vs baseline): "
          f"{geomean:.3f}")
    print(f"  >10% faster: {faster}, >10% slower: {slower}")
    worst = sorted(speedups.items(), key=lambda kv: kv[1])[:args.report_worst]
    for n, s in worst:
        print(f"    worst: {n}: {base[n]:.3f}s -> {treat[n]:.3f}s "
              f"({1 / s:.2f}x slower)")
    if geomean < args.min_geomean:
        print(f"  geomean speedup {geomean:.3f} < {args.min_geomean}: "
              "FLIP DISALLOWED — keep the change opt-in / gated")
        sys.exit(1)
    print(f"  geomean speedup {geomean:.3f} >= {args.min_geomean}: "
          "flip allowed")


if __name__ == "__main__":
    main()
