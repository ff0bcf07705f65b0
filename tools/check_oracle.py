#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then run each oracle SQL in DuckDB over the same parquet tables
and compare row count, column names/dtypes, and exact values.

Usage: python3 tools/check_oracle.py [sfdir] [outdir] [--skip-verify]
           [--only name1,name2,...] [--json path]

--only       restrict both the Spark Verify run and the DuckDB compare to a
             comma-separated subset of query names (round-sized iteration at
             big SFs: the all-or-nothing sf1 run costs >90 min of DuckDB).
--json PATH  write a machine-readable per-query verdict (default:
             <outdir>/check_oracle.json, CORRECTNESS-style).
Output is line-buffered so a tail -f of a long sf1 run shows progress live.
"""
import json
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.stdout.reconfigure(line_buffering=True)
sys.stderr.reconfigure(line_buffering=True)


def arg_value(flag):
    if flag in sys.argv:
        i = sys.argv.index(flag)
        if i + 1 < len(sys.argv):
            return sys.argv[i + 1]
    return None


POSITIONAL = [a for i, a in enumerate(sys.argv[1:], start=1)
              if not a.startswith("--")
              and sys.argv[i - 1] not in ("--only", "--json")]
SF = POSITIONAL[0] if len(POSITIONAL) > 0 else "/root/testdata/sf0.01"
OUT = Path(POSITIONAL[1] if len(POSITIONAL) > 1 else "/tmp/verify_out")
ONLY = set(arg_value("--only").split(",")) if arg_value("--only") else None
JSON_PATH = Path(arg_value("--json") or OUT / "check_oracle.json")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify():
    names = f" {','.join(sorted(ONLY))}" if ONLY else ""
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{names}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True,
                       timeout=7200)
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
    if ONLY:
        oracles = {k: v for k, v in oracles.items() if k in ONLY}
    verdicts = {}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        pq = OUT / name
        if not pq.exists():
            print(f"FAIL {name}: no spark output at {pq}")
            verdicts[name] = {"match": False, "errors": [f"no spark output at {pq}"]}
            n_fail += 1
            continue
        spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            verdicts[name] = {"match": False, "errors": [f"oracle SQL error: {e}"]}
            n_fail += 1
            continue
        errs = compare(name, spark_df, oracle_df)
        verdicts[name] = {"match": not errs, "rows": len(spark_df), "errors": errs}
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
    wanted = produced if ONLY is None else produced & ONLY
    for name in sorted(wanted - set(oracles)):
        df = con.sql(f"SELECT * FROM '{OUT / name}/*.parquet'").df()
        print(f"INFO {name}: no oracle, {len(df)} rows")
    JSON_PATH.write_text(json.dumps(
        {"sf": SF, "pass": n_pass, "fail": n_fail, "queries": verdicts}, indent=1))
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()


