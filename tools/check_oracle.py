#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then run each oracle SQL in DuckDB over the same parquet tables
and compare row count, column names/dtypes, and exact values.

Usage: python3 tools/check_oracle.py [sfdir] [outdir] [--skip-verify]
"""
import json
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(f"verify failed rc={r.returncode}")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    errs = []
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        errs.append(f"cols spark={list(a.columns)} oracle={list(b.columns)}")
        return errs
    if len(a) != len(b):
        errs.append(f"rows spark={len(a)} oracle={len(b)}")
        return errs
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) != str(bv.dtype):
            errs.append(f"dtype[{c}] spark={av.dtype} oracle={bv.dtype}")
        try:
            eq = (av.fillna("__NA__") == bv.fillna("__NA__")) if av.dtype == object \
                else ((av == bv) | (av.isna() & bv.isna()))
        except Exception as e:
            errs.append(f"cmp[{c}] error {e}")
            continue
        bad = (~eq).to_numpy().nonzero()[0]
        if len(bad):
            i = int(bad[0])
            errs.append(f"value[{c}] {len(bad)} diffs; first row {i}: "
                        f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
    return errs


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.loads((OUT / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracles):
        pq = OUT / name
        if not pq.exists():
            print(f"FAIL {name}: no spark output at {pq}")
            n_fail += 1
            continue
        spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        errs = compare(name, spark_df, oracle_df)
        if errs:
            n_fail += 1
            print(f"FAIL {name}:")
            for e in errs[:4]:
                print(f"   {e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    # queries without oracle: rows-only smoke
    produced = {p.name for p in OUT.iterdir() if p.is_dir()}
    for name in sorted(produced - set(oracles)):
        df = con.sql(f"SELECT * FROM '{OUT / name}/*.parquet'").df()
        print(f"INFO {name}: no oracle, {len(df)} rows")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
