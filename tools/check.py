#!/usr/bin/env python3
"""Local differential checker mirroring the driver's t2 gate:
run graft.Verify output against DuckDB oracles on the same parquet tables.

Usage: python3 tools/check.py [sfDir] [verifyOut] [--only a,b,c | --changed-since <git-ref>]
(Assumes `sbt "runMain graft.Verify <sfDir> <verifyOut>"` already ran —
pair subset flags with SPARK_GRAFT_VERIFY_ONLY on the dump side.)

Subset modes (registry scale hygiene — the full 298-query matrix stays the
round-close gate; these make the IN-LOOP gate proportional to the edit):
  --only a,b,c            check only the named queries.
  --changed-since <ref>   check only queries whose defining Scala/oracle
                          text changed since <ref>: changed files from
                          `git diff --name-only`, expanded to a FIXED-POINT
                          closure over "file references a top-level object
                          defined in the closure" across all main sources
                          (so a change to a leaf module reached indirectly
                          — query -> operators/X -> functions/Y — still
                          gates its consumers), then every query name
                          literal in the closure's queries/*.scala files.
                          Shared infra (Q/Tables/Verify/SparkEntry) →
                          full run.
"""
import sys, json, glob, math, os, re, subprocess
import duckdb
import pandas as pd
import numpy as np

args = [a for a in sys.argv[1:]]
ONLY = None
if "--only" in args:
    i = args.index("--only")
    ONLY = set(args[i + 1].split(","))
    del args[i:i + 2]
if "--changed-since" in args:
    i = args.index("--changed-since")
    ref = args[i + 1]
    del args[i:i + 2]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    changed = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", "src/main/scala"],
        cwd=repo, capture_output=True, text=True, check=True
    ).stdout.split()
    infra = {"src/main/scala/graft/Q.scala", "src/main/scala/graft/Tables.scala",
             "src/main/scala/graft/Verify.scala", "src/main/scala/graft/SparkEntry.scala"}
    if any(f in infra for f in changed):
        print(f"[subset] shared infra changed since {ref}; running FULL gate")
    else:
        qfiles = set(glob.glob(f"{repo}/src/main/scala/graft/queries/*.scala"))
        # FIXED-POINT dependency closure (r10 advice: a one-hop expansion
        # silently dropped queries reached indirectly, e.g. query file ->
        # operators/X -> functions/Y where the query file never names Y):
        # iterate "file references an object defined in the closure" over
        # ALL main-source files until stable, THEN intersect with query
        # files. Object-name grep is conservative (may over-include),
        # which only widens the subset — never under-gates.
        src_files = set(glob.glob(
            f"{repo}/src/main/scala/graft/**/*.scala", recursive=True))
        bodies = {p: open(p).read() for p in src_files}
        objs_of = {p: re.findall(r"^object (\w+)", bodies[p], re.M)
                   for p in src_files}
        closure = {f"{repo}/{f}" for f in changed
                   if f"{repo}/{f}" in src_files}
        frontier_objs = {o for p in closure for o in objs_of.get(p, [])}
        seen_objs = set(frontier_objs)
        while frontier_objs:
            pat = re.compile(
                r"\b(" + "|".join(re.escape(o) for o in frontier_objs) + r")\b")
            newly = {p for p in src_files - closure if pat.search(bodies[p])}
            closure |= newly
            frontier_objs = {o for p in newly for o in objs_of.get(p, [])
                             } - seen_objs
            seen_objs |= frontier_objs
        affected = closure & qfiles
        ONLY = set()
        for qf in affected:
            ONLY |= set(re.findall(r'"([a-z]\d+[a-z0-9_]*)"', bodies[qf]))
        print(f"[subset] {len(changed)} changed files since {ref} -> "
              f"closure {len(closure)} src files -> {len(affected)} query "
              f"files -> filtering to name literals")

SF = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
OUT = args[1] if len(args) > 1 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
if ONLY is not None:
    skipped = [n for n in oracle if n not in ONLY]
    oracle = {n: s for n, s in oracle.items() if n in ONLY}
    print(f"[subset] checking {len(oracle)} queries "
          f"({len(skipped)} outside the subset skipped, NOT counted)")
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
