#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: runs each oracle
SQL in DuckDB against the same parquet tables and compares with the
Verify.scala parquet dumps (columns sorted by name, rows as-written)."""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{SF_DIR}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    # driver fixtures are single files; ScaleFixture output is a Spark
    # directory of part files — glob inside it for DuckDB
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

class Flushing(list):
    """per-query verdict + wall printed AS IT LANDS (r17: the silent
    90-minute sf10 run taught us a tail -f must show progress and a
    killed run must keep its partial evidence)"""
    def __init__(self, tag):
        self.tag = tag
    def append(self, item):
        name = item if isinstance(item, str) else item[0]
        detail = "" if isinstance(item, str) else f"  {item[1]}"
        print(f"[check] {name:<26} {self.tag:<9} {time.time()-T0:7.0f}s total{detail}",
              flush=True)
        super().append(item)

import time
T0 = time.time()
fails, passes, skipped = Flushing("FAIL"), Flushing("PASS"), Flushing("rows-only")
for name in sorted(os.listdir(OUT)):
    d = os.path.join(OUT, name)
    if not os.path.isdir(d):
        continue
    if name not in oracle:
        skipped.append(name)
        continue
    try:
        spark_tbl = pq.read_table(d).to_pandas()
        ddb = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"load/query error: {str(e)[:200]}"))
        continue
    sc = sorted(spark_tbl.columns)
    dc = sorted(ddb.columns)
    if sc != dc:
        fails.append((name, f"columns differ: spark={sc} duckdb={dc}"))
        continue
    s = spark_tbl[sc].reset_index(drop=True)
    t = ddb[dc].reset_index(drop=True)
    if len(s) != len(t):
        fails.append((name, f"row counts differ: spark={len(s)} duckdb={len(t)}"))
        continue
    bad = None
    for c in sc:
        sv, tv = s[c], t[c]
        try:
            import numpy as np
            if sv.dtype.kind == "f" and tv.dtype.kind == "f":
                # BYTE-exact like the driver's hash gate: -0.0 != +0.0
                # (both-NaN counts as equal; parquet NaNs are canonical)
                sb = sv.to_numpy(dtype="float64").view("uint64")
                tb = tv.to_numpy(dtype="float64").view("uint64")
                eq = (sb == tb) | (sv.isna().to_numpy() & tv.isna().to_numpy())
                eq = __import__("pandas").Series(eq)
            else:
                eq = (sv.astype(object).where(sv.notna(), None) ==
                      tv.astype(object).where(tv.notna(), None)) | (sv.isna() & tv.isna())
        except Exception as e:
            bad = (c, f"compare error {e}")
            break
        if not eq.all():
            i = int((~eq).idxmax())
            bad = (c, f"row {i}: spark={sv.iloc[i]!r} duckdb={tv.iloc[i]!r} "
                      f"({int((~eq).sum())}/{len(s)} rows differ)")
            break
    if bad:
        fails.append((name, f"col {bad[0]}: {bad[1]}"))
    else:
        passes.append(name)

print(f"PASS ({len(passes)}):", " ".join(passes))
print(f"ROWS-ONLY ({len(skipped)}):", " ".join(skipped))
print(f"FAIL ({len(fails)}):")
for n, msg in fails:
    print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)
