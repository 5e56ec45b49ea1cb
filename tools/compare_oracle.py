#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Driver-faithful lookup: enumerates the Spark OUTPUT directories
(outDir/<name>.parquet) and resolves each one's oracle statement by that
exact directory basename — including the ".parquet" suffix — from
oracle_sql.json. A query whose oracle is keyed only by the bare name is
reported NO-ORACLE here, exactly as the driver records it (this keying
mismatch silently zeroed round 1's official correctness score).

Rows are sorted by all columns via pandas sort_values before comparison,
like the driver, so non-hashable column types (e.g. array columns) crash
here too instead of only in the driver run.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_noracle = 0
    out_dirs = sorted(d for d in glob.glob(f"{out_dir}/*.parquet")
                      if os.path.isdir(d))
    for d in out_dirs:
        name = os.path.basename(d)      # "<query>.parquet" — the driver's key
        spark_files = glob.glob(f"{d}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name}: no spark part files"); n_bad += 1; continue
        sql = oracle.get(name)
        if sql is None:
            print(f"NO-ORACLE {name}: oracle_sql.json has no key {name!r}")
            n_noracle += 1
            continue
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)]))
        except Exception as e:
            print(f"READ-ERR {name}: {e}"); n_bad += 1; continue
        problems = []
        if list(want.columns) != list(got.columns):
            problems.append(f"cols want={list(want.columns)} got={list(got.columns)}")
        elif len(want) != len(got):
            problems.append(f"rows want={len(want)} got={len(got)}")
        else:
            for c in want.columns:
                w, g = want[c], got[c]
                try:
                    if w.dtype.kind == 'f' or g.dtype.kind == 'f':
                        import numpy as np
                        wv, gv = w.astype(float).values, g.astype(float).values
                        neq = ~((wv == gv) | (pd.isna(wv) & pd.isna(gv)))
                        if neq.any():
                            dd = abs(wv[neq] - gv[neq])
                            problems.append(f"col {c}: {neq.sum()} diffs, maxabs={dd.max():.3e}")
                    else:
                        if not w.astype(str).equals(g.astype(str)):
                            neq = (w.astype(str) != g.astype(str))
                            i = neq.idxmax()
                            problems.append(f"col {c}: {neq.sum()} diffs, first row {i}: want={w[i]!r} got={g[i]!r}")
                except Exception as e:
                    problems.append(f"col {c}: compare error {e}")
        if problems:
            print(f"FAIL     {name}: " + "; ".join(problems[:4])); n_bad += 1
        else:
            print(f"OK       {name} ({len(want)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_noracle} no-oracle")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
