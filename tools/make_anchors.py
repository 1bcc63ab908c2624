#!/usr/bin/env python3
"""Regenerate ANCHORS.tsv from a committed bench_full.json.

The bench's in-run adjudication (graft.Bench: >2x-CPU solo tail pass,
+/-10% shuffle-byte drift warnings -- BASELINE.md section 'protocol')
reads per-query anchors from this flat TSV so it needs no JSON parser.
Run after a round's bench artifact is accepted as the new anchor set:

    python3 tools/make_anchors.py [bench_full.json] [ANCHORS.tsv]
"""
import json, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "ANCHORS.tsv"
# Cross-round continuity: snapshot the anchors being replaced so the
# NEXT bench can emit a second ratio set against the PRIOR round's
# committed numbers (graft.Bench reads <dst base>_prev.tsv) -- the
# regenerated-per-round primary gate is self-referential by itself.
if os.path.exists(dst):
    base, ext = os.path.splitext(dst)
    shutil.copyfile(dst, f"{base}_prev{ext}")
    print(f"snapshotted {dst} -> {base}_prev{ext}")
tm = json.load(open(src))["task_metrics"]
with open(dst, "w") as f:
    f.write("# Per-query adjudication anchors (local[32]): median executor\n")
    f.write("# CPU seconds + median shuffle-read bytes from the committed\n")
    f.write(f"# full-registry artifact ({src}). Regenerate after any\n")
    f.write("# accepted plan change:  python3 tools/make_anchors.py\n")
    f.write("# name\tcpu_sec\tshr_b\n")
    for name in sorted(tm):
        m = tm[name]
        f.write(f"{name}\t{m['cpu_sec']:.6f}\t{m['shr_b']}\n")
print(f"wrote {dst}: {len(tm)} anchors from {src}")
