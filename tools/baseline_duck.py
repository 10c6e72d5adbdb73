#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the same parquet tables —
the denominator for the "within 2x of baseline" judgment.

Runs graft.Verify at the given SF first (the replay oracles read
decision tables exported by that run, at a path scoped to the Verify
JVM's pid), then executes each oracle N times in DuckDB and records
the minimum wall time to BASELINE_duck.json.

Usage: python3 tools/baseline_duck.py [sfdir] [--skip-verify]
"""
import json
import os
import subprocess
import sys
import time

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.1"
OUT = "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=6000)
    if r.returncode != 0:
        print("VERIFY FAILED", r.returncode)
        for line in (r.stdout + r.stderr).splitlines()[-30:]:
            print(line)
        sys.exit(1)


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(oracles):
        best = None
        err = None
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                con.sql(oracles[name]).fetchall()
            except Exception as e:  # noqa: BLE001 - record and move on
                err = str(e).splitlines()[0][:200]
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {"sec": round(best, 4) if best is not None else None,
                         "err": err}
    total = sum(v["sec"] for v in results.values() if v["sec"] is not None)
    doc = {"sf": SF_DIR, "engine": "duckdb", "reps": 3, "metric": "min",
           "total_sec": round(total, 3),
           "n_queries": len(results), "queries": results}
    with open("BASELINE_duck.json", "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"{len(results)} oracles, duckdb total {total:.1f}s "
          f"-> BASELINE_duck.json")
    for name, v in sorted(results.items(), key=lambda kv: -(kv[1]["sec"] or 0))[:10]:
        print(f"  {name}: {v['sec']}s" + (f" ERR {v['err']}" if v["err"] else ""))


if __name__ == "__main__":
    main()
