#!/usr/bin/env python3
"""Local differential checker mirroring the driver's t2 gate:
run graft.Verify output against DuckDB oracles on the same parquet tables.

Usage: python3 tools/check.py [sfDir] [verifyOut]
(Assumes `sbt "runMain graft.Verify <sfDir> <verifyOut>"` already ran.)
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in oracle.items():
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    # driver sorts columns by name before hashing
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
        n_fail += 1
        continue
    sdf, odf = sdf[scols], odf[scols]
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        n_fail += 1
        continue
    ok = True
    for c in scols:
        a, b = sdf[c], odf[c]
        # normalize timestamps/dates to comparable form
        if pd.api.types.is_datetime64_any_dtype(a) or pd.api.types.is_datetime64_any_dtype(b):
            a = pd.to_datetime(a).astype("datetime64[us]")
            b = pd.to_datetime(b).astype("datetime64[us]")
            eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
        elif a.dtype.kind == "f" or b.dtype.kind == "f":
            # Driver-faithful: the driver hashes raw dtyped values, so an
            # integer column on one side vs a float column on the other
            # (the DuckDB HUGEINT->pandas float64 trap: bare sum() of an
            # integer) hash-mismatches even when values are numerically
            # equal. float == int here would mask exactly that class.
            if (a.dtype.kind in "iu") != (b.dtype.kind in "iu") and \
               (a.dtype.kind in "iuf" and b.dtype.kind in "iuf"):
                print(f"FAIL {name}: col '{c}' dtype kind mismatch: "
                      f"spark={a.dtype} oracle={b.dtype} "
                      f"(bare sum() in oracle? wrap in CAST(... AS BIGINT))")
                ok = False
                break
            av, bv = a.astype(float).values, b.astype(float).values
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not eq.all():
                bad = ~eq
                md = np.nanmax(np.abs(av[bad] - bv[bad]))
                print(f"  [{name}.{c}] {bad.sum()} float diffs, maxdiff={md:.3e}")
        elif a.dtype.kind in "iu" and b.dtype.kind in "iu" and a.dtype != b.dtype:
            # Same-kind width mismatch (int32 vs int64): integer VALUES render
            # identically so the driver's value hash is expected to agree, but
            # surface it — it is one CAST away from the float/int class above.
            print(f"  [{name}.{c}] note: integer width differs "
                  f"spark={a.dtype} oracle={b.dtype}")
            eq = (a.astype("int64").values == b.astype("int64").values)
        else:
            a = a.where(pd.notna(a), None)
            b = b.where(pd.notna(b), None)
            eq = np.array([x == y or (x is None and y is None)
                           for x, y in zip(a.tolist(), b.tolist())])
        if not eq.all():
            i = int(np.argmax(~eq))
            print(f"FAIL {name}: col '{c}' differs at row {i}: "
                  f"spark={sdf[c].iloc[i]!r} oracle={odf[c].iloc[i]!r}")
            ok = False
            break
    if ok:
        n_pass += 1
        print(f"PASS {name} ({len(sdf)} rows)")
    else:
        n_fail += 1

print(f"\n{n_pass} passed, {n_fail} failed, "
      f"{len(oracle)} with oracle")
sys.exit(1 if n_fail else 0)
