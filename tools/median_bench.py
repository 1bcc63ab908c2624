#!/usr/bin/env python3
"""Fold N bench_full.json passes into per-query medians.

Usage: python3 tools/median_bench.py out.json pass1.json [pass2.json ...]

Writes {"total": <sum of per-query medians>, "n": <queries>,
"queries": {name: median_sec}} and prints a short summary plus the
largest per-query spreads (max/min across passes) — the noise signal
that motivated median-based gating.
"""
import json, statistics, sys

def main():
    out_path, passes = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p))["queries"] for p in passes]
    names = sorted(set().union(*[set(r) for r in runs]))
    med = {n: statistics.median([r[n] for r in runs if n in r]) for n in names}
    total = sum(med.values())
    json.dump({"total": round(total, 3), "n": len(names), "passes": len(runs),
               "queries": {n: round(v, 3) for n, v in med.items()}},
              open(out_path, "w"), indent=0)
    print(f"passes={len(runs)} queries={len(names)} "
          f"median-total={total:.1f}s "
          f"pass-totals={[round(sum(r.values()),1) for r in runs]}")
    spread = sorted(((max(r[n] for r in runs if n in r) /
                      max(1e-9, min(r[n] for r in runs if n in r)), n)
                     for n in names), reverse=True)[:8]
    for ratio, n in spread:
        print(f"  spread {ratio:4.1f}x  {n}  " +
              " ".join(f"{r.get(n, float('nan')):.2f}" for r in runs))

if __name__ == "__main__":
    main()
