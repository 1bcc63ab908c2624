#!/usr/bin/env python3
"""One-command sf10 (100x) VALUE gate — the standing end-of-round protocol
(r15 verdict task 7). Runs graft.Verify over every eligible oracle query at
the scaled fixture, routes each dumped result to the right comparator by
OUTPUT SIZE (small results -> tools/check.py, batched in one process;
row-set-shaped results -> tools/check_except.py, fresh process per query —
the r15 allocator-cascade lesson), and emits the COVERAGE gate record as
one JSON line plus a pasteable summary.

Eligibility = the documented fence taxonomy (COVERAGE.md, r14/r15 gates):
every oracle query EXCEPT
  - Q.scaleBound fences: declared oracle-scale-only baselines whose plan
    is deliberately not the production shape,
  - the all-pairs jaccard ORACLE replays (the Spark side scales; DuckDB's
    O(n^2) replay of the shared jaccard CTE does not),
  - the recursive-CTE cluster oracles (same: the transitive-closure
    replay is the unscalable half).
The lists mirror the declarations in src/main/scala/graft/queries; the
script cross-checks each exclusion still names a live oracle query and
FAILS on drift, so a renamed/removed fence cannot silently widen or
shrink the gate.

Usage:
  python3 tools/sf10_gate.py <scaledSfDir> <outDir> [--skip-verify]

  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 are the documented knobs for
  the Verify step; DUCK_MEM / DUCK_THREADS tune the DuckDB side.
  --skip-verify reuses an existing <outDir> dump (re-check only).
"""
import json, os, subprocess, sys, glob

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# Q.scaleBound fences (declared oracle-scale-only plans)
SCALE_BOUND = [
    "q_agg_percentile", "q_join_cross",
    "q_dedup_embedding_cosine", "q_dedup_embedding_clusters",
]
# DuckDB-side all-pairs jaccard replays (oracle cost, not engine cost)
JACCARD_ORACLE_COST = [
    "q_dedup_ngram_jaccard", "q_dedup_jaccard_incremental",
    "q_dedup_jaccard_incr_loaded", "q_dedup_jaccard_incr_appended",
    "q_dedup_jaccard_incr_deleted", "q_dedup_containment",
]
# DuckDB-side recursive-CTE transitive closures over the jaccard CTE
RECURSIVE_ORACLE_COST = ["q_dedup_clusters", "q_dedup_clusters_best"]

# results past this row count compare inside DuckDB (check_except.py,
# fresh process) instead of check.py's fetchall
HEAVY_ROWS = 100_000


def run(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    return subprocess.run(cmd, **kw)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    sf_dir, out_dir = args

    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    if "--skip-verify" not in flags or not os.path.exists(oracle_path):
        # cheap pre-pass: dump ONLY oracle_sql.json by running Verify on a
        # single tiny query first? Not needed — derive eligibility after
        # the full dump requires knowing names first. Solution: ask Verify
        # for the trivial q1_agg dump to obtain oracle_sql.json, derive
        # the eligible list, then run the full scoped dump.
        pre = run(["sbt", "-batch",
                   f"runMain graft.Verify {sf_dir} {out_dir} q1_agg"],
                  cwd=REPO)
        if pre.returncode != 0:
            print("GATE-ERR: Verify pre-pass failed")
            sys.exit(1)
    oracle = json.load(open(oracle_path))

    excluded = SCALE_BOUND + JACCARD_ORACLE_COST + RECURSIVE_ORACLE_COST
    drift = [q for q in excluded if q not in oracle]
    if drift:
        print(f"GATE-ERR: exclusion list drift — not oracle queries: {drift}")
        sys.exit(1)
    eligible = sorted(q for q in oracle if q not in excluded)
    print(f"[gate] {len(oracle)} oracle queries, {len(excluded)} fenced, "
          f"{len(eligible)} eligible")

    if "--skip-verify" not in flags:
        r = run(["sbt", "-batch",
                 "runMain graft.Verify " + sf_dir + " " + out_dir + " " +
                 " ".join(eligible)], cwd=REPO)
        if r.returncode != 0:
            print("GATE-ERR: Verify failed")
            sys.exit(1)

    import duckdb
    light, heavy, missing = [], [], []
    for q in eligible:
        files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
        if not files:
            missing.append(q)
            continue
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{q}/*.parquet')"
        ).fetchone()[0]
        (heavy if n > HEAVY_ROWS else light).append(q)
    print(f"[gate] routing: {len(light)} via check.py, {len(heavy)} via "
          f"check_except.py, {len(missing)} missing dumps")

    n_pass = n_fail = 0
    fails = []

    FAIL_PREFIXES = ("MISSING-SPARK", "TYPE-RISK", "TYPE-DIFF", "ORACLE-ERR",
                     "SPARK-READ-ERR", "SCHEMA-DIFF", "ROWS-DIFF",
                     "VALUE-DIFF", "ROWS-ONLY-ERR")

    def consume(proc_output, returncode, label):
        # A comparator that CRASHES (traceback, import error, OOM-kill)
        # emits no PASS/FAIL lines at all — without the returncode check
        # its queries would vanish from the tally and the gate could go
        # green having compared nothing (r16 ADVICE, medium).
        nonlocal n_pass, n_fail
        for line in proc_output.splitlines():
            if line.startswith("PASS"):
                n_pass += 1
            elif line.startswith(FAIL_PREFIXES):
                n_fail += 1
                fails.append(line.strip())
            print(line)
        if returncode not in (0, 1):
            n_fail += 1
            fails.append(f"COMPARATOR-CRASH {label} rc={returncode}")

    if light:
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "check.py"), sf_dir, out_dir]
            + light, capture_output=True, text=True, cwd=REPO)
        consume(r.stdout + r.stderr, r.returncode, "check.py")
    for q in heavy:  # fresh allocator per heavy result (the r15 lesson)
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "check_except.py"), sf_dir,
             out_dir, q], capture_output=True, text=True, cwd=REPO)
        consume(r.stdout + r.stderr, r.returncode, q)
    for q in missing:
        n_fail += 1
        fails.append(f"MISSING-SPARK {q}")

    # every eligible query must have produced a counted verdict line:
    # a silent shortfall (crashed comparator, truncated output) fails
    # loudly instead of shrinking the denominator
    attempted = len(light) + len(heavy) + len(missing)
    if n_pass + n_fail < attempted:
        short = attempted - n_pass - n_fail
        n_fail += short
        fails.append(f"TALLY-SHORTFALL {short} queries produced no verdict")

    record = {
        "gate": "sf_value_gate",
        "sf_dir": sf_dir,
        "oracle_total": len(oracle),
        "fenced": len(excluded),
        "eligible": len(eligible),
        "attempted": len(light) + len(heavy) + len(missing),
        "pass": n_pass,
        "fail": n_fail,
        "fails": fails[:20],
        "light": len(light),
        "heavy": len(heavy),
    }
    print(json.dumps(record))
    with open(os.path.join(out_dir, "gate_record.json"), "w") as f:
        json.dump(record, f, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
