#!/usr/bin/env python3
"""Memory-bounded variant of check.py for LARGE results (the sf10 gate):
compares Spark verify output against the DuckDB oracle entirely inside
DuckDB (counts + EXCEPT ALL both ways), so multi-million-row results are
never materialized into Python lists — check.py's fetchall() on a 15M-row
result holds tens of GB of Python objects and starves DuckDB's allocator
for every query after it (the r15 sf10 leg's ORACLE-ERR cascade).

Semantics vs check.py: same schema check (column names, sorted); value
compare is SQL equality instead of repr-string equality, so it is exactly
as strict on doubles (bit equality modulo -0.0/NaN normalization, which
SQL equality also applies). Multiset equality = equal counts + empty
EXCEPT ALL in one direction.

Usage: python3 tools/check_except.py <sfDir> <verifyOutDir> <query> [query ...]
Run one process per query (or small batch) — the point is a fresh
allocator per heavy result.
"""
import json, sys, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    for name in names:
        con = duckdb.connect()
        con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '48GB')}'")
        if os.environ.get("DUCK_THREADS"):
            con.execute(f"SET threads={os.environ['DUCK_THREADS']}")
        con.execute("SET temp_directory='/tmp/duck_spill'")
        for t in ["region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings"]:
            p = f"{sf_dir}/{t}.parquet"
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
        sql = oracle.get(name)
        pq = os.path.join(out_dir, name)
        if sql is None:
            print(f"NO-ORACLE     {name}")
            continue
        if not glob.glob(os.path.join(pq, "*.parquet")):
            print(f"MISSING-SPARK {name}")
            fails += 1
            continue
        try:
            orows = con.execute(f"DESCRIBE ({sql})").fetchall()
            srows = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{pq}/*.parquet')"
            ).fetchall()
            otypes = {r[0]: r[1] for r in orows}
            stypes = {r[0]: r[1] for r in srows}
            # the name comparison runs over the RAW DESCRIBE rows, not the
            # dicts: a duplicated column name collapses in a dict and
            # would slip past the schema gate (r16 ADVICE)
            ocols, scols = [r[0] for r in orows], [r[0] for r in srows]
            if sorted(scols) != sorted(ocols):
                print(f"SCHEMA-DIFF   {name}: spark={sorted(scols)} oracle={sorted(ocols)}")
                fails += 1
                continue
            # typed gate (r16): DuckDB's EXCEPT would silently coerce
            # INT vs BIGINT / REAL vs DOUBLE, so a type drift between the
            # Spark output and the declared oracle would pass unseen.
            # Flag it explicitly — a drifted type is a contract break even
            # when today's values survive the coercion.
            tdiff = {c: (stypes[c], otypes[c]) for c in ocols
                     if stypes.get(c) != otypes[c]}
            if tdiff:
                print(f"TYPE-DIFF     {name}: " + ", ".join(
                    f"{c}: spark={s} oracle={o}" for c, (s, o) in tdiff.items()))
                fails += 1
                continue
            cols = ", ".join(f'"{c}"' for c in sorted(ocols))
            # TEMP TABLE, not VIEW: a view would re-evaluate the oracle
            # for every consumer (count + EXCEPT = twice), and a heavy
            # aggregation that fits the limit once can OOM on the second
            # pass over a fragmented allocator
            con.execute(f"CREATE TEMP TABLE o AS SELECT {cols} FROM ({sql})")
            con.execute(f"CREATE VIEW s AS SELECT {cols} FROM "
                        f"read_parquet('{pq}/*.parquet')")
            n_o = con.execute("SELECT count(*) FROM o").fetchone()[0]
            n_s = con.execute("SELECT count(*) FROM s").fetchone()[0]
            if n_o != n_s:
                print(f"ROWS-DIFF     {name}: spark={n_s} oracle={n_o}")
                fails += 1
                continue
            extra = con.execute(
                "SELECT count(*) FROM (SELECT * FROM s EXCEPT ALL SELECT * FROM o)"
            ).fetchone()[0]
            if extra:
                print(f"VALUE-DIFF    {name}: {extra} spark rows not in oracle")
                for r in con.execute(
                        "SELECT * FROM (SELECT * FROM s EXCEPT ALL SELECT * FROM o) LIMIT 2"
                        ).fetchall():
                    print(f"    spark-only: {str(r)[:200]}")
                fails += 1
                continue
            print(f"PASS          {name} ({n_s} rows, except-mode)")
        except Exception as e:
            print(f"ORACLE-ERR    {name}: {e}")
            fails += 1
        finally:
            con.close()
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
