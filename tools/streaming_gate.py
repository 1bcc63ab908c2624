#!/usr/bin/env python3
"""One-command streaming-at-scale gate (r18 task 1; sibling of
skew_gate.py / sf10_gate.py).

The eight standing maintenance sinks (StreamMain op=neardup maintain=1 /
spandedup / semdedup / ann / bloomdedup / quality / decontaminate /
imagededup) are the 100 TB production duty cycle, but until r18 their
only scale evidence was fixture-scale e2e. This gate replays the 10x
ScaleUp fixture through EVERY sink with per-batch telemetry (StreamMain
prints one JSON line per micro-batch: wall / CPU / shuffle / input /
spill deltas + rows + committed append subtrees) and asserts the
duty-cycle properties e2e cannot see:

  1. >= MIN_BATCHES micro-batches per sink (the replay is a real stream,
     not one swallow).
  2. Zero errors; per-leg spill under a floor.
  3. PER-BATCH WORK SHAPE, by sink class:
       - frozen-index probes (ann / quality / decontaminate /
         imagededup) and the fixed-size bloom filter: per-batch CPU and
         shuffle bytes stay FLAT as batches accumulate (late/mid ratio
         under a slack bound) — a monotone climb means the sink is
         rescanning something that grows;
       - accumulating-index sinks (neardup maintain / spandedup /
         semdedup): per-batch work may grow AT MOST LINEARLY with the
         accumulated state (probe cost is O(standing index)); the gate
         asserts batch_k work <= linear-in-k bound x slack — a
         QUADRATIC climb (the un-collapsed-class shape) blows it.
  4. Artifact growth gates trip when planted: after the semdedup run has
     committed >= MIN_BATCHES append subtrees, `IndexMain check-semdedup
     maxsubtrees=3` must exit 1, and after compact-semdedup the check
     must go green — the compaction cadence signal works on a REAL
     streamed artifact.
  5. SKEW LEG (r18 task 8): the planted 1%-identical class (ScaleUp skew
     fixture) ARRIVES THROUGH THE STREAM into op=neardup maintain=1 and
     op=semdedup. Batch-side collapse + rep-level probes must keep
     per-batch work inside the same linear bound even though every batch
     carries ~1% exact-duplicate members of one giant class and the
     artifact accumulates the class across keyed appends (the quadratic
     the r16/r17 collapse work exists to prevent, now exercised on the
     streaming ingest path).

Emits streaming_gate_record.json into <outDir>; exits nonzero on any
violation.

Usage:
  python3 tools/streaming_gate.py <outDir> [--src /root/testdata/sf0.1]
      [--f10 /tmp/sf1] [--skew /tmp/skew10] [--skip-build]

SPARK_GRAFT_CPUS / SPARK_DRIVER_MEM tune the JVM legs as usual.
"""
import json, os, shutil, subprocess, sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

MIN_BATCHES = 5
TARGET_BATCHES = 7             # files-per-trigger derives from the table's
                               # actual part count (ScaleUp writes one part
                               # per configured CPU, which varies)
SPILL_FLOOR = 64 * 2**20       # per-leg total spill ("zero spill")
FLAT_SLACK = 3.0               # frozen-index sinks: late/mid per-batch ratio
LINEAR_SLACK = 3.0             # accumulating sinks: vs linear-in-state bound

# (op, table, extra args, accumulating?)
SINKS = [
    ("neardup",       "documents",  ["maintain=1"], True),
    ("spandedup",     "documents",  [],             True),
    ("semdedup",      "embeddings", [],             True),
    # bloom's FILTER is fixed-size but the positives' exact-confirm join
    # scans the accumulated key appends — linear in state, like the
    # other maintaining sinks (measured: shr_b grows ~linearly per batch)
    ("bloomdedup",    "documents",  [],             True),
    ("ann",           "embeddings", [],             False),
    ("quality",       "documents",  [],             False),
    ("decontaminate", "documents",  [],             False),
    ("imagededup",    "documents",  [],             False),
]

SKEW_SINKS = [  # task 8: the hot class arrives through the stream
    ("neardup",  "documents",  ["maintain=1"], True),
    ("semdedup", "embeddings", [],             True),
]


def run(cmd, env=None, capture=False):
    print("+ " + " ".join(cmd), flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, env=e, cwd=REPO, text=True,
                          capture_output=capture)


def build_fixture(src, out, factor, mode):
    marker = os.path.join(out, f".streaming_gate_built_{mode}")
    alt = os.path.join(out, ".skew_gate_built")  # skew fixture is shared
    if os.path.exists(marker) or (mode == "skew" and os.path.exists(alt)):
        print(f"[stream-gate] fixture {out} present")
        return
    r = run(["sbt", "-batch",
             f"runMain graft.tools.ScaleUp {src} {out} {factor} {mode}"])
    if r.returncode != 0:
        print(f"GATE-ERR: ScaleUp {out} failed")
        sys.exit(1)
    open(marker, "w").write(f"factor={factor} mode={mode}\n")


def stream_leg(name, fixture, table, op, extra, work_dir):
    """Run one StreamMain replay; return (batches, final_line)."""
    out = os.path.join(work_dir, name)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    table_dir = f"{fixture}/{table}.parquet"
    parts = len([f for f in os.listdir(table_dir)
                 if f.endswith(".parquet")]) if os.path.isdir(table_dir) else 1
    per_trigger = max(1, parts // TARGET_BATCHES)
    args = [table_dir, f"{out}/out",
            f"files={per_trigger}", f"op={op}",
            f"index={out}/idx"] + extra
    r = run(["sbt", "-batch",
             "runMain graft.streaming.StreamMain " + " ".join(args)],
            capture=True)
    batches, final = [], None
    for line in r.stdout.splitlines():
        if '"batch"' in line and "{" in line:
            batches.append(json.loads(line[line.index("{"):]))
        elif '"state":"finished"' in line and "{" in line:
            final = json.loads(line[line.index("{"):])
    if r.returncode != 0 or final is None:
        print(r.stdout[-4000:])
        print(r.stderr[-2000:] if r.stderr else "")
        return None, None, f"LEG-ERROR {name}: exit={r.returncode}"
    return batches, final, None


def check_leg(name, batches, accumulating, fails):
    if batches is None:
        return {}
    n = len(batches)
    if n < MIN_BATCHES:
        fails.append(f"BATCHES {name}: {n} < {MIN_BATCHES}")
        return {"batches": n}
    spill = sum(b["spill_b"] for b in batches)
    if spill > SPILL_FLOOR:
        fails.append(f"SPILL {name}: {spill} B > {SPILL_FLOOR}")
    # drop the first batch (JIT/codegen warmup) and the last (often a
    # partial file set); compare a LATE batch against an EARLY-mid one
    mid = batches[1:-1] if n > 2 else batches
    cpus = [b["cpu_sec"] for b in mid]
    bts = [b["shr_b"] + b["inp_b"] for b in mid]
    k0, k1 = 0, len(mid) - 1
    stats = {
        "batches": n,
        "spill_b": spill,
        "cpu_per_batch": [round(c, 3) for c in cpus],
        "bytes_per_batch": bts,
        "append_subtrees": batches[-1]["append_subtrees"],
    }
    # bytes-vs-state curve (r19 task 7): per-batch work bytes divided by
    # the standing artifact's on-disk size after the batch (StreamMain's
    # index_b). For a sink whose probe is pinned to the matched slice the
    # ratio FALLS as state grows; a flat ratio is the declared
    # linear-in-state contract; a RISING ratio is super-linear probe work
    # and the thing this field exists to expose.
    if all("index_b" in b for b in mid) and any(b["index_b"] > 0 for b in mid):
        stats["index_b_per_batch"] = [b["index_b"] for b in mid]
        stats["bytes_over_state"] = [
            round(bt / max(1, b["index_b"]), 4)
            for bt, b in zip(bts, mid)]
    def ratio(vals):
        lo = max(vals[k0], 1e-3 if isinstance(vals[k0], float) else 1)
        return vals[k1] / lo
    if accumulating:
        # probe cost may grow with standing state: batch k probes ~k
        # batches of appends, so the LINEAR reference for the last mid
        # batch is (k1+1)/(k0+1) x the first mid batch; quadratic growth
        # (the un-collapsed-class shape) exceeds it by another factor k
        lin = (k1 + 2) / (k0 + 2)
        bound = lin * LINEAR_SLACK
        label = f"linear bound {bound:.1f}x"
    else:
        bound = FLAT_SLACK
        label = f"flat bound {bound:.1f}x"
    for metric, vals in (("cpu", cpus), ("bytes", bts)):
        r = ratio(vals)
        stats[f"{metric}_late_over_early"] = round(r, 2)
        if r > bound:
            fails.append(
                f"WORK-GROWTH {name} {metric}: late/early {r:.1f}x > {label}")
    return stats


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:]
                if a.startswith("--") and "=" in a)
    flags = {a for a in sys.argv[1:] if a.startswith("--") and "=" not in a}
    if len(args) != 1:
        print(__doc__)
        sys.exit(2)
    out_dir = args[0]
    os.makedirs(out_dir, exist_ok=True)
    src = opts.get("src", "/root/testdata/sf0.1")
    f10 = opts.get("f10", "/tmp/sf1")
    skew = opts.get("skew", "/tmp/skew10")
    work = os.path.join(out_dir, "work")
    os.makedirs(work, exist_ok=True)

    if "--skip-build" not in flags:
        build_fixture(src, f10, 10, "shard")
        build_fixture(src, skew, 10, "skew")

    fails = []
    legs = {}

    # --- the eight sinks over the clean 10x fixture ---
    for op, table, extra, acc in SINKS:
        name = f"f10_{op}"
        batches, final, err = stream_leg(name, f10, table, op, extra, work)
        if err:
            fails.append(err)
            continue
        legs[name] = check_leg(name, batches, acc, fails)
        legs[name]["final"] = final

    # --- skew leg: the hot class arrives through the stream (task 8) ---
    for op, table, extra, acc in SKEW_SINKS:
        name = f"skew_{op}"
        batches, final, err = stream_leg(name, skew, table, op, extra, work)
        if err:
            fails.append(err)
            continue
        legs[name] = check_leg(name, batches, acc, fails)
        legs[name]["final"] = final

    # --- artifact growth gate trips when planted (semdedup accumulated
    # >= MIN_BATCHES subtrees above), then compaction restores green ---
    sem_idx = os.path.join(work, "f10_semdedup", "idx")
    growth = {"tripped": None, "compacted_green": None}
    if os.path.isdir(sem_idx):
        r = run(["sbt", "-batch",
                 f"runMain graft.tools.IndexMain check-semdedup {f10} "
                 f"{sem_idx} maxsubtrees=3"], capture=True)
        growth["tripped"] = r.returncode != 0
        if r.returncode == 0:
            fails.append("GROWTH-GATE check-semdedup maxsubtrees=3 did NOT "
                         "trip after a multi-batch stream")
        dest = os.path.join(work, "f10_semdedup", "idx_compacted")
        shutil.rmtree(dest, ignore_errors=True)
        r2 = run(["sbt", "-batch",
                  f"runMain graft.tools.IndexMain compact-semdedup {f10} "
                  f"{sem_idx} dest={dest}"], capture=True)
        r3 = run(["sbt", "-batch",
                  f"runMain graft.tools.IndexMain check-semdedup {f10} "
                  f"{dest} maxsubtrees=3"], capture=True)
        growth["compacted_green"] = r2.returncode == 0 and r3.returncode == 0
        if not growth["compacted_green"]:
            fails.append("GROWTH-GATE compact-semdedup did not restore green")
    else:
        fails.append("GROWTH-GATE semdedup artifact missing")

    record = {
        "gate": "streaming_gate",
        "src": src, "f10": f10, "skew": skew,
        "target_batches": TARGET_BATCHES,
        "min_batches": MIN_BATCHES,
        "legs": legs,
        "growth_gate": growth,
        "fails": fails,
        "pass": not fails,
    }
    with open(os.path.join(out_dir, "streaming_gate_record.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "legs"}))
    if fails:
        print("[stream-gate] FAIL:\n  " + "\n  ".join(fails))
        sys.exit(1)
    print(f"[stream-gate] PASS — {len(legs)} legs, all >= {MIN_BATCHES} "
          "batches, work shape within bounds, growth gate trips + clears")


if __name__ == "__main__":
    main()
