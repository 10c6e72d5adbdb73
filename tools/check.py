#!/usr/bin/env python3
"""Local correctness gate, mirroring the driver's t2 check:
run graft.Verify at a given SF -> parquet per query + oracle_sql.json,
run each oracle in DuckDB over the same parquet tables, compare
row count, schema (sorted column names), and a sorted-row hash.

Usage: python3 tools/check.py [sfdir] [--skip-verify]
"""
import hashlib
import json
import os
import subprocess
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT = "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    # clean slate: stale dirs from renamed/deleted queries must not count
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=3000)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    if r.returncode != 0:
        print("VERIFY FAILED", r.returncode)
        sys.exit(1)


def normhash(rows, cols):
    # sort columns by name, then rows by string repr -> order-insensitive
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(repr(r[i]) for i in idx) for r in rows)
    h = hashlib.sha256()
    for r in canon:
        h.update("\x01".join(r).encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    declared = json.load(open(f"{OUT}/queries.json"))
    results = {}
    for name in sorted(declared):
        d = os.path.join(OUT, name)
        if not os.path.isdir(d):
            results[name] = {"ok": False, "err": "no output (query failed in Verify)"}
            continue
        try:
            sres = con.execute(
                f"SELECT * FROM '{d}/*.parquet'").fetchall()
            scols = [c[0] for c in con.description]
        except Exception as e:
            results[name] = {"ok": False, "err": f"spark read: {e}"}
            continue
        if name not in oracles:
            results[name] = {"ok": True, "rows_only": True, "rows": len(sres)}
            continue
        try:
            orel = con.sql(oracles[name])
            # Gate blind spot (round-10 postmortem): DuckDB sum() over
            # integers yields HUGEINT (int128) and its Python repr is a
            # plain int, so normhash here matches while the driver's
            # hasher (typed) fails. Refuse any oracle whose result
            # schema carries HUGEINT/DECIMAL -- force CAST(... AS
            # BIGINT/DOUBLE) in the oracle SQL instead.
            badtypes = [f"{c}:{t}" for c, t in zip(orel.columns, orel.types)
                        if str(t).upper().startswith(("HUGEINT", "UHUGEINT",
                                                      "DECIMAL"))]
            if badtypes:
                results[name] = {
                    "ok": False,
                    "err": f"oracle result type not driver-safe "
                           f"(cast to BIGINT/DOUBLE): {badtypes}"}
                continue
            ores = orel.fetchall()
            ocols = list(orel.columns)
        except Exception as e:
            results[name] = {"ok": False, "err": f"oracle: {e}"}
            continue
        ok_rows = len(sres) == len(ores)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = normhash(sres, scols), normhash(ores, ocols)
        results[name] = {"ok": ok_rows and ok_cols and sh == oh,
                         "rows": len(sres), "oracle_rows": len(ores),
                         "cols_match": ok_cols, "hash_match": sh == oh}
        if not ok_cols:
            results[name]["cols"] = [scols, ocols]
    n_ok = sum(1 for v in results.values() if v["ok"])
    for name, v in sorted(results.items()):
        flag = "OK " if v["ok"] else "FAIL"
        extra = "" if v["ok"] else json.dumps(v)
        ro = " (rows-only)" if v.get("rows_only") else ""
        print(f"{flag} {name}{ro} rows={v.get('rows')} {extra}")
    print(f"\n{n_ok}/{len(results)} pass")
    # first-mismatch debugging aid
    for name, v in sorted(results.items()):
        if not v["ok"]:
            print(f"\n--- first failing: {name}")
            if name in oracles and "err" not in v:
                d = os.path.join(OUT, name)
                print("spark:",
                      con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchall()[:5])
                print("oracle:", con.execute(oracles[name]).fetchall()[:5])
            break
    sys.exit(0 if n_ok == len(results) else 2)


if __name__ == "__main__":
    main()
