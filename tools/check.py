#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: compare Verify output parquet
against DuckDB running the declared oracle SQL over the same fixture tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols):
    # driver-style canonicalization: sort columns by name, render values
    out = []
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # normalize -0.0 and render stably
                if v == 0:
                    v = 0.0
                vals.append(f"{v!r}")
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver fixtures are single files; Spark-written fixtures
        # (tools/ScaleUp) are directories of part files — accept both
        p = f"{sf_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        pq = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(pq, "*.parquet")):
            print(f"MISSING-SPARK {name}")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
            # the driver's hash is TYPE-sensitive while this script
            # stringifies values — so a DuckDB-only integer type passes
            # here but fails the real gate (the round-1 HUGEINT gotcha).
            # Flag any oracle column typed outside Spark's type system.
            otypes = con.execute(f"DESCRIBE {sql}").fetchall()
            bad_types = [(c, t) for c, t, *_ in otypes
                         if t in ("HUGEINT", "UHUGEINT", "UBIGINT",
                                  "UINTEGER", "USMALLINT", "UTINYINT")]
            if bad_types:
                print(f"TYPE-RISK     {name}: oracle columns {bad_types} have "
                      "no Spark equivalent — CAST them (driver hash will fail)")
                n_fail += 1
                continue
        except Exception as e:
            print(f"ORACLE-ERR    {name}: {e}")
            n_fail += 1
            continue
        try:
            sdf = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetchall()
            scols = [d[0] for d in con.description]
        except Exception as e:
            print(f"SPARK-READ-ERR {name}: {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"SCHEMA-DIFF   {name}: spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        a, b = canon(sdf, scols), canon(odf, ocols)
        if len(a) != len(b):
            print(f"ROWS-DIFF     {name}: spark={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        if a != b:
            bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"VALUE-DIFF    {name}: first diffs at rows {bad}")
            for i in bad[:2]:
                print(f"    spark : {a[i][:200]}")
                print(f"    oracle: {b[i][:200]}")
            n_fail += 1
            continue
        print(f"PASS          {name} ({len(a)} rows)")
        n_pass += 1
    # queries with no oracle: rows-only
    spark_dirs = {os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(p)}
    for name in sorted(spark_dirs - set(oracle)):
        if only and name not in only:
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            print(f"ROWS-ONLY     {name} ({n} rows)")
            n_skip += 1
        except Exception as e:
            print(f"ROWS-ONLY-ERR {name}: {e}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
