"""Perf-regression gate: diff two bench JSON files, fail on regressions.

Compares the fused timings (and speedups) of a candidate run against a
baseline (e.g. the committed BENCH_LOCAL.json from the previous round) and
exits nonzero if any shared row regressed by more than --tolerance
(default 10%). Marginal-timing noise is a few percent; 10% catches real
regressions without flaking.

Usage:
  python bench.py                     # writes BENCH_LOCAL.json
  python scripts/bench_gate.py BASELINE.json BENCH_LOCAL.json [--tolerance 0.10]
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("candidate")
    ap.add_argument("--tolerance", type=float, default=0.10)
    args = ap.parse_args()

    base = json.load(open(args.baseline))
    cand = json.load(open(args.candidate))

    # (metric, higher_is_better): times gate upward drift; throughput /
    # MFU / serving-retention rows (train_460m*, engine_mixed_load) gate
    # downward drift
    metrics = (("fused_s", False), ("time_s", False), ("step_ms", False),
               ("tokens_s", True), ("mfu_pct", True),
               ("retained_pct", True), ("mixed_tps", True))
    failures = []
    for key in sorted(set(base) & set(cand)):
        if key.startswith("_"):  # _meta bookkeeping, not a bench row
            continue
        b, c = base[key], cand[key]
        for metric, higher_is_better in metrics:
            if metric in b and metric in c:
                try:
                    bv, cv = float(b[metric]), float(c[metric])
                except (TypeError, ValueError):
                    continue
                if bv == 0:  # a stalled run's retained_pct/mixed_tps
                    if cv == 0 and higher_is_better:
                        # 0 -> 0 on a throughput metric means the metric
                        # has been dead across BOTH runs; silently passing
                        # would disable the gate for it forever
                        print(f"{key}.{metric}: baseline 0 AND current 0 "
                              f"— stalled metric, FLAGGED")
                        failures.append(key)
                    else:
                        print(f"{key}.{metric}: baseline 0 -> {cv:.6g} "
                              f"(skipped: no ratio)")
                    continue
                ratio = cv / bv
                flag = (ratio < 1 - args.tolerance if higher_is_better
                        else ratio > 1 + args.tolerance)
                mark = "REGRESSED" if flag else "ok"
                print(f"{key}.{metric}: {bv:.6g} -> {cv:.6g} "
                      f"({ratio:.2f}x) {mark}")
                if flag:
                    failures.append(key)
    if failures:
        print(f"\n{len(failures)} regression(s): {failures}", file=sys.stderr)
        sys.exit(1)
    print("\nno regressions")


if __name__ == "__main__":
    main()
