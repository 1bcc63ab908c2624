#!/usr/bin/env python3
"""Smoke test for tools/make_anchors.py (r19 task 4): anchor rows,
hot-leg carry, prev snapshot, and the testdata fingerprint rows.

Run:  python3 tools/test_make_anchors.py
"""
import json, os, subprocess, sys, tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def run(src, dst, cwd):
    subprocess.run(
        [sys.executable, os.path.join(HERE, "make_anchors.py"), src, dst],
        cwd=cwd, check=True, capture_output=True)


def main():
    with tempfile.TemporaryDirectory(prefix="graft_anchor_smoke") as d:
        # tiny fixture: one single-file parquet table (the testdata shape)
        sfdir = os.path.join(d, "sf0.1")
        os.makedirs(sfdir)
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.table({"x": list(range(7))}),
                       os.path.join(sfdir, "orders.parquet"))
        tbytes = os.path.getsize(os.path.join(sfdir, "orders.parquet"))

        bench = os.path.join(d, "bench_full.json")
        art = {"sf": sfdir,
               "task_metrics": {"q_a": {"cpu_sec": 1.0, "shr_b": 1000},
                                "q_b": {"cpu_sec": 2.0, "shr_b": 5000}},
               "solo": {}}
        json.dump(art, open(bench, "w"))
        dst = os.path.join(d, "ANCHORS.tsv")
        run(bench, dst, d)
        lines = open(dst).read().splitlines()
        rows = {l.split("\t")[0]: l.split("\t") for l in lines
                if l and not l.startswith("#")}
        assert set(rows) == {"q_a", "q_b"}, rows
        fps = [l.split("\t") for l in lines if l.startswith("# fp\t")]
        assert fps == [["# fp", "orders", "7", str(tbytes)]], fps

        # second run: q_a CPU 3x hot with flat bytes -> carried at prior;
        # q_b bytes moved (plan change) -> accepted at the new CPU
        art["task_metrics"]["q_a"]["cpu_sec"] = 3.0
        art["task_metrics"]["q_b"] = {"cpu_sec": 9.0, "shr_b": 50000}
        json.dump(art, open(bench, "w"))
        run(bench, dst, d)
        assert os.path.exists(os.path.join(d, "ANCHORS_prev.tsv"))
        lines = open(dst).read().splitlines()
        rows = {l.split("\t")[0]: l.split("\t") for l in lines
                if l and not l.startswith("#")}
        assert float(rows["q_a"][1]) == 1.0, rows["q_a"]   # carried
        assert float(rows["q_b"][1]) == 9.0, rows["q_b"]   # accepted
        assert any(l.startswith("# carried\tq_a") for l in lines)
        assert [l.split("\t") for l in lines if l.startswith("# fp\t")] \
            == [["# fp", "orders", "7", str(tbytes)]]
    print("make_anchors smoke: OK")


if __name__ == "__main__":
    main()
