#!/usr/bin/env python3
"""Ratchet BASELINE.json's gate_baseline onto a green full-drill record.

The ratchet RUNS tools/bench_gate.py on the record first and refuses to
ratchet unless it passes against the current gate_baseline — the
ratchet must never launder a regression into the denominator (r16
nearly did: its 408 s record, a measured 1.23x regression over r15,
must not become the gate everyone else is compared against). From r15
on the canary cross-check's denominator is a MEASURED host-speed
reading taken by the same run that produced the per-query map, not a
value inferred from the median it is supposed to cross-check (the r14
bootstrap).

Usage:
  python3 tools/ratchet_baseline.py bench_results/r15.json --round 15
  (--skip-gate only for bootstrap on a repo with no usable gate yet)
"""
import argparse
import json
import os
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", help="bench_results/rN.json (full-suite record)")
    ap.add_argument("--round", type=int, required=True,
                    help="round number the record belongs to")
    ap.add_argument("--baseline", default="BASELINE.json")
    ap.add_argument("--skip-gate", action="store_true",
                    help="bootstrap only: ratchet without gating (never "
                         "for a normal round close)")
    args = ap.parse_args()

    if not args.skip_gate:
        gate_py = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_gate.py")
        rc = subprocess.call([sys.executable, gate_py, args.bench,
                              "--baseline", args.baseline])
        if rc != 0:
            raise SystemExit(
                f"ERROR: bench_gate FAILED (rc {rc}) on {args.bench} — "
                "refusing to ratchet a regressed record into the gate "
                "denominator")

    with open(args.bench) as f:
        bench = json.load(f)
    if bench.get("subset"):
        raise SystemExit("ERROR: subset record — cannot ratchet")
    best = bench.get("best", bench.get("queries", {}))
    if not best or any(t < 0 for t in best.values()):
        raise SystemExit("ERROR: record empty or contains failed queries")
    cans = [bench.get("canary_before_s", -1), bench.get("canary_after_s", -1)]
    cans = [c for c in cans if isinstance(c, (int, float)) and c > 0]
    if not cans:
        raise SystemExit("ERROR: record carries no canary readings — the "
                         "gate's canary cross-check needs a measured "
                         "denominator (re-run the full bench)")

    with open(args.baseline) as f:
        base = json.load(f)
    gate = base.setdefault("gate_baseline", {})
    gate["recorded_round"] = args.round
    gate["purpose"] = (
        "Per-query regression-gate denominator (tools/bench_gate.py). "
        "Ratcheted each green round to the latest full-drill record by "
        "tools/ratchet_baseline.py, AFTER bench_gate passes that record "
        "against the previous denominator.")
    gate["best_total_s"] = round(sum(best.values()), 4)
    gate["n_queries"] = len(best)
    gate["queries"] = {k: best[k] for k in sorted(best)}
    # min(before, after): the quieter of the two brackets — the same
    # convention bench_gate applies to the record under test, so the
    # ratio is like-for-like
    gate["canary_s"] = round(min(cans), 4)
    gate["canary_s_note"] = (
        f"MEASURED: min(canary_before_s, canary_after_s) of the r{args.round} "
        "full-drill record itself (bracketing host-speed canaries, "
        "graft.Bench hostCanary).")
    gate.pop("new_query_note", None)

    with open(args.baseline, "w") as f:
        json.dump(base, f, indent=1)
        f.write("\n")
    print(f"ratcheted gate_baseline -> r{args.round}: "
          f"{len(best)} queries, best_total {gate['best_total_s']}s, "
          f"canary {gate['canary_s']}s (measured)")


if __name__ == "__main__":
    main()
