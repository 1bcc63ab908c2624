#!/usr/bin/env python3
"""Regenerate ANCHORS.tsv from a committed bench_full.json.

The bench's in-run adjudication (graft.Bench: >2x-CPU solo tail pass,
+/-10% shuffle-byte drift warnings -- BASELINE.md section 'protocol')
reads per-query anchors from this flat TSV so it needs no JSON parser.
Run after a round's bench artifact is accepted as the new anchor set:

    python3 tools/make_anchors.py [bench_full.json] [ANCHORS.tsv]

Hot-leg acceptance guard (r18 task 2): a row whose CPU exceeds 1.3x its
PRIOR anchor while shuffle bytes stay within +/-10% has an identical
plan on a contended box -- accepting the inflated reading would let a
genuine ~2x regression on that row read as ~1.0x next round. Such rows
carry the in-artifact solo re-run value when the bench took one,
otherwise the prior anchor, and the carried set is printed + recorded
as a trailing comment in the TSV. Bytes always come from the new
artifact (plan-pure).
"""
import json, os, shutil, sys

HOT_CPU_RATIO = 1.3
BYTE_BAND = 0.10

src = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "ANCHORS.tsv"

# prior anchors, for the hot-leg guard AND the _prev continuity snapshot
prior = {}
if os.path.exists(dst):
    for line in open(dst):
        parts = line.strip().split("\t")
        if len(parts) >= 3 and not line.startswith("#"):
            try:
                prior[parts[0]] = (float(parts[1]), int(parts[2]))
            except ValueError:
                pass
    base, ext = os.path.splitext(dst)
    shutil.copyfile(dst, f"{base}_prev{ext}")
    print(f"snapshotted {dst} -> {base}_prev{ext}")

j = json.load(open(src))
tm = j["task_metrics"]
solo = j.get("solo", {})
carried = {}
rows = {}
for name in sorted(tm):
    m = tm[name]
    cpu, shr = m["cpu_sec"], m["shr_b"]
    if name in prior:
        pcpu, pshr = prior[name]
        byte_flat = pshr == shr == 0 or (
            pshr > 0 and abs(shr / pshr - 1.0) <= BYTE_BAND)
        if pcpu > 0 and cpu / pcpu > HOT_CPU_RATIO and byte_flat:
            # identical plan, contended reading: prefer the quiet solo
            # re-run if the bench took one AND the solo itself clears the
            # hot test (a solo taken on the same contended box is no
            # quieter than the leg); else keep the prior anchor
            s = solo.get(name, {}).get("cpu_sec")
            fallback = s if s is not None and s / pcpu <= HOT_CPU_RATIO \
                else pcpu
            carried[name] = (cpu, fallback)
            cpu = fallback
    rows[name] = (cpu, shr)

def fixture_fingerprint(sfdir):
    """Per-table (rows, bytes) of the benched fixture -- rows from the
    parquet footer only (pyarrow), bytes as the sum of data-file sizes
    (matches what Bench can cheaply recompute). A table is either a
    single .parquet file (the driver's testdata) or a directory of
    part files (ScaleUp fixtures)."""
    out = []
    try:
        import pyarrow.parquet as pq
    except ImportError:
        pq = None
    for t in sorted(os.listdir(sfdir)):
        if not t.endswith(".parquet"):
            continue
        p = os.path.join(sfdir, t)
        files = [p] if os.path.isfile(p) else sorted(
            os.path.join(p, x) for x in os.listdir(p)
            if x.endswith(".parquet"))
        nbytes = sum(os.path.getsize(x) for x in files)
        nrows = -1
        if pq is not None:
            try:
                nrows = sum(pq.ParquetFile(x).metadata.num_rows
                            for x in files)
            except Exception:
                pass
        out.append((t[:-len(".parquet")], nrows, nbytes))
    return out

with open(dst, "w") as f:
    f.write("# Per-query adjudication anchors (local[32]): median executor\n")
    f.write("# CPU seconds + median shuffle-read bytes from the committed\n")
    f.write(f"# full-registry artifact ({src}). Regenerate after any\n")
    f.write("# accepted plan change:  python3 tools/make_anchors.py\n")
    f.write("# name\tcpu_sec\tshr_b\n")
    for name, (cpu, shr) in rows.items():
        f.write(f"{name}\t{cpu:.6f}\t{shr}\n")
    if carried:
        f.write("# hot-leg rows NOT accepted at their in-leg CPU "
                "(byte-flat, >1.3x prior; kept solo/prior value):\n")
        for name, (hot, kept) in carried.items():
            f.write(f"# carried\t{name}\thot={hot:.3f}\tkept={kept:.3f}\n")
    # Testdata fingerprint (r19 task 4): the driver regenerates
    # /root/testdata every round, and 8 of the 12 r18 byte-drift flags
    # were that level shift, not plan drift. Record per-table rows +
    # data-file bytes of the fixture these anchors were measured on;
    # Bench re-reads the byte side per run and emits `fixture_drift`,
    # so fixture-shift drift is machine-separable from plan drift.
    sfdir = j.get("sf", "")
    if sfdir and os.path.isdir(sfdir):
        f.write("# testdata fingerprint of the anchored fixture "
                "(rows from parquet footers, bytes = data files):\n")
        for t, nrows, nbytes in fixture_fingerprint(sfdir):
            f.write(f"# fp\t{t}\t{nrows}\t{nbytes}\n")

for name, (hot, kept) in carried.items():
    print(f"HOT-LEG CARRY {name}: in-leg cpu {hot:.3f} -> kept {kept:.3f}")
print(f"wrote {dst}: {len(rows)} anchors from {src}, {len(carried)} carried")
