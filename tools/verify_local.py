#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare row count, (sorted-by-name) schema, and a value hash.

Usage: python3 tools/verify_local.py [sfDir] [outDir] [--skip-spark]
"""
import json, os, subprocess, sys, hashlib

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-spark" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(f"Verify run failed rc={r.returncode}")

import duckdb  # noqa: E402
con = duckdb.connect()
for t in TABLES:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(df):
    cols = sorted(df.columns)
    df = df[cols]
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(canon(v) for v in row) + "\n").encode())
    return h.hexdigest(), len(df), cols


fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{OUT}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append(name)
        print(f"FAIL {name}: no spark output")
        continue
    try:
        sdf = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        odf = con.sql(sql).df()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {e}")
        continue
    sh, sn, sc = table_hash(sdf)
    oh, on, oc = table_hash(odf)
    if sc != oc:
        fails.append(name)
        print(f"FAIL {name}: columns spark={sc} oracle={oc}")
    elif sn != on:
        fails.append(name)
        print(f"FAIL {name}: rows spark={sn} oracle={on}")
    elif sh != oh:
        fails.append(name)
        print(f"FAIL {name}: hash mismatch ({sn} rows)")
        merged = sdf[sorted(sdf.columns)].compare(odf[sorted(odf.columns)]) \
            if sn == on else None
        if merged is not None and len(merged):
            print(merged.head(5))
    else:
        print(f"OK   {name} ({sn} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
