#!/usr/bin/env python3
"""Fold bench passes into per-query medians + spread report.

Two input shapes:
  1. (r7+) ONE bench_full.json from the in-driver median mode: its
     "queries" are already per-query medians and "raw" holds each
     query's back-to-back pass array — the spread report reads "raw".
  2. (pre-r7) N single-pass bench_full.json files: medians are computed
     across the files.

Usage: python3 tools/median_bench.py out.json pass1.json [pass2.json ...]
"""
import json, statistics, sys

def main():
    out_path, passes = sys.argv[1], sys.argv[2:]
    blobs = [json.load(open(p)) for p in passes]
    if len(blobs) == 1 and "raw" in blobs[0]:
        raw = blobs[0]["raw"]
        runs = None
        med = {n: statistics.median(ts) for n, ts in raw.items()}
        spreads = {n: (max(ts) / max(1e-9, min(ts)), ts) for n, ts in raw.items()}
        n_passes = blobs[0].get("mode", "median?")
    else:
        runs = [b["queries"] for b in blobs]
        names = sorted(set().union(*[set(r) for r in runs]))
        med = {n: statistics.median([r[n] for r in runs if n in r]) for n in names}
        spreads = {n: (max(r[n] for r in runs if n in r) /
                       max(1e-9, min(r[n] for r in runs if n in r)),
                       [r.get(n) for r in runs]) for n in names}
        n_passes = len(runs)
    total = sum(med.values())
    json.dump({"total": round(total, 3), "n": len(med), "passes": str(n_passes),
               "queries": {n: round(v, 3) for n, v in sorted(med.items())}},
              open(out_path, "w"), indent=0)
    print(f"passes={n_passes} queries={len(med)} median-total={total:.1f}s")
    worst = sorted(((r, n, ts) for n, (r, ts) in spreads.items()), reverse=True)[:8]
    for ratio, n, ts in worst:
        vals = " ".join(f"{t:.2f}" for t in ts if t is not None)
        print(f"  spread {ratio:4.1f}x  {n}  {vals}")

if __name__ == "__main__":
    main()
