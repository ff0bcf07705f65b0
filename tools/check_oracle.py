#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then run each oracle SQL in DuckDB over the same parquet tables
and compare row count, column names/dtypes, and exact values.

Usage: python3 tools/check_oracle.py [sfdir] [outdir] [--skip-verify]
           [--only name1,name2,...] [--json path] [--timeout SEC]
           [--mem LIMIT] [--threads N] [--replicas N]

--only       restrict both the Spark Verify run and the DuckDB compare to a
             comma-separated subset of query names (round-sized iteration at
             big SFs: the all-or-nothing sf1 run costs >90 min of DuckDB).
--json PATH  write a machine-readable per-query verdict (default:
             <outdir>/check_oracle.json, CORRECTNESS-style).
--timeout S  per-oracle wall-clock budget; a replay past it is interrupted
             (duckdb con.interrupt()) and recorded as "oracle_timeout"
             instead of hanging a big-SF run for hours. For replica-method
             oracles the budget is GLOBAL across all replica passes
             (including patch-phase global_sql), not per replica.
--mem LIMIT  DuckDB memory_limit (e.g. 48GB) — the sf10 runs need an
             explicit cap so a single spilling hash can't OOM the box.
--threads N  DuckDB threads.
--replicas N enable the PER-REPLICA derivation path (sf10_methods.METHODS)
             for queries whose whole-table replay is single-node-infeasible:
             the GenScale corpus is N disjoint replica shards by key
             construction, so a replica-equivariant oracle is replayed on
             replica-sliced views at per-replica cost and the slices are
             combined (concat / key-summed merge / column-sum / global
             top-k re-cut) — the tools/sf10_graph_oracle.py pattern,
             generalized. Every verdict carries a "method" field.
Output is line-buffered so a tail -f of a long sf1 run shows progress live.
"""
import json
import subprocess
import sys
import threading
import time
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


VALUE_FLAGS = ("--only", "--json", "--timeout", "--mem", "--threads",
               "--replicas")
POSITIONAL = [a for i, a in enumerate(sys.argv[1:], start=1)
              if not a.startswith("--")
              and sys.argv[i - 1] not in VALUE_FLAGS]
SF = POSITIONAL[0] if len(POSITIONAL) > 0 else "/root/testdata/sf0.01"
OUT = Path(POSITIONAL[1] if len(POSITIONAL) > 1 else "/tmp/verify_out")
ONLY = set(arg_value("--only").split(",")) if arg_value("--only") else None
JSON_PATH = Path(arg_value("--json") or OUT / "check_oracle.json")
TIMEOUT = float(arg_value("--timeout")) if arg_value("--timeout") else None
MEM = arg_value("--mem")
THREADS = arg_value("--threads")
REPLICAS = int(arg_value("--replicas")) if arg_value("--replicas") else None
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


class OracleTimeout(Exception):
    pass


def run_df(con, sql, timeout=None):
    """Execute sql -> DataFrame, interrupting past `timeout` seconds.

    The timer callback sets a flag BEFORE interrupting, and an INTERRUPT
    error is classified as a timeout only when that flag is set and the
    elapsed time actually reached the budget (ADVICE r11: a bare
    Timer(timeout, con.interrupt) could fire in the gap between query
    completion and timer.cancel(), misclassifying a query that finished
    at the budget edge — or spuriously interrupting the NEXT statement
    on the shared connection). A spurious interrupt (flag unset or
    elapsed < budget) is retried once."""
    if not timeout:
        return con.sql(sql).df()
    fired = threading.Event()

    def _interrupt():
        fired.set()
        con.interrupt()

    for attempt in (0, 1):
        timer = threading.Timer(timeout, _interrupt)
        timer.start()
        t0 = time.time()
        try:
            return con.sql(sql).df()
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                if fired.is_set() and time.time() - t0 >= timeout * 0.98:
                    raise OracleTimeout() from None
                if attempt == 0:
                    # interrupt leaked from a previous statement's timer
                    # (or fired with the budget not actually consumed):
                    # not this query's timeout — run it again
                    fired.clear()
                    continue
                raise OracleTimeout() from None
            raise
        finally:
            timer.cancel()


def tune(con):
    if MEM:
        con.execute(f"SET memory_limit='{MEM}'")
    if THREADS:
        con.execute(f"SET threads={THREADS}")
    # Spill away from the repo (DuckDB's default temp is cwd/.tmp — an
    # unbounded whole-table replay once wrote 65 GB into /root/repo/.tmp)
    # and cap it so one pathological replay degrades to an error for THAT
    # oracle instead of filling the disk for everything else on the box.
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET max_temp_directory_size='40GB'")


class ReplicaEngine:
    """Per-replica oracle replay over the GenScale corpus (see
    tools/sf10_methods.py for the soundness argument). Owns a SEPARATE
    duckdb connection whose table views are re-pointed at one replica
    slice at a time, so the main connection's whole-table views are
    never disturbed. Each replica-keyed table is materialized ONCE,
    physically ordered by replica id, so per-replica range filters prune
    by zonemap instead of rescanning the full table N times."""

    def __init__(self, replicas):
        import sf10_methods
        self.spec_mod = sf10_methods
        self.R = replicas
        self.con = duckdb.connect()
        tune(self.con)
        self.ready = set()
        self._premises_ok = set()  # premise SQL texts already verified

    # FK-alignment premises verified from the data (not assumed): every
    # key domain a table carries must agree on the replica id, else the
    # per-replica slices would not be self-contained.
    _FK = {
        "lineitem": "l_orderkey // 1000000 != l_partkey // 100000 "
                    "OR l_orderkey // 1000000 != l_suppkey // 10000",
        "orders": "o_orderkey // 1000000 != o_custkey // 100000",
        "events": "event_id // 1000000 != user_id // 100000",
    }

    def ensure(self, tables):
        keys = self.spec_mod.REPLICA_KEYS
        for t in tables:
            if t in self.ready:
                continue
            if t in keys:
                col, off = keys[t]
                self.con.execute(
                    f"CREATE TABLE __rep_{t} AS SELECT * FROM "
                    f"'{SF}/{t}.parquet' ORDER BY {col} // {off}")
                lo, hi, n = self.con.execute(
                    f"SELECT min({col} // {off}), max({col} // {off}), "
                    f"count(DISTINCT {col} // {off}) FROM __rep_{t}").fetchone()
                assert (lo, hi, n) == (0, self.R - 1, self.R), \
                    f"{t}: replica-id range ({lo},{hi},{n}) != (0,{self.R - 1},{self.R})"
                if t in self._FK:
                    bad = self.con.execute(
                        f"SELECT count(*) FROM __rep_{t} WHERE {self._FK[t]}"
                    ).fetchone()[0]
                    assert bad == 0, f"{t}: {bad} rows violate replica FK alignment"
            else:
                self.con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
            self.ready.add(t)

    def _set_replica(self, r, tables):
        keys = self.spec_mod.REPLICA_KEYS
        for t in tables:
            if t in keys:
                col, off = keys[t]
                self.con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM __rep_{t} "
                    f"WHERE {col} >= {r * off} AND {col} < {(r + 1) * off}")

    def run(self, name, sql, spec, timeout=None):
        import re

        import numpy as np
        tables = [t for t in TABLES if re.search(rf"\b{t}\b", sql)]
        self.ensure(tables)
        # Value-level decomposition premise (sf10_methods docstring): run
        # once per distinct premise text, over the WHOLE table (replica
        # views not yet narrowed — _set_replica runs later).
        prem = spec.get("premise_sql")
        if prem and prem not in self._premises_ok:
            for t in tables:
                if t in self.spec_mod.REPLICA_KEYS:
                    col, off = self.spec_mod.REPLICA_KEYS[t]
                    self.con.execute(
                        f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM __rep_{t}")
            bad = int(self.con.execute(prem).fetchone()[0])
            assert bad == 0, f"{name}: {bad} rows violate the decomposition premise"
            self._premises_ok.add(prem)
        # `timeout` is the GLOBAL wall-clock budget for this oracle
        # (ADVICE r11: per-replica application let one pathological oracle
        # consume R x timeout): every replica pass — including the
        # patch-phase global_sql passes — draws from the same remaining
        # budget, so the whole derivation is bounded by `timeout` seconds.
        t0 = time.time()

        def remaining():
            if not timeout:
                return None
            left = timeout - (time.time() - t0)
            if left <= 0:
                raise OracleTimeout()
            return left

        if "patch" in spec:
            old, tmpl = spec["patch"]
            assert sql.count(old) == 1, f"{name}: patch anchor not unique"
            g = 0
            for r in range(self.R):
                self._set_replica(r, tables)
                g += int(run_df(self.con, spec["global_sql"],
                                remaining()).iloc[0, 0])
            sql = sql.replace(old, tmpl.format(g=g))
        parts = []
        for r in range(self.R):
            self._set_replica(r, tables)
            parts.append(run_df(self.con, sql, remaining()))
        m = spec["method"]
        if m == "concat":
            df = pd.concat(parts, ignore_index=True).sort_values(
                spec["sort"], kind="mergesort").reset_index(drop=True)
        elif m == "merge_sum":
            df = pd.concat(parts, ignore_index=True)
            df = df.groupby(spec["keys"], as_index=False).sum()
            df = df[list(parts[0].columns)].sort_values(
                spec["keys"], kind="mergesort").reset_index(drop=True)
        elif m == "sum_row":
            allr = pd.concat(parts, ignore_index=True)
            xor = set(spec.get("xor_cols", []))
            row = {c: (np.bitwise_xor.reduce(allr[c].to_numpy())
                       if c in xor else allr[c].sum())
                   for c in allr.columns}
            df = pd.DataFrame([row]).astype(
                {c: allr[c].dtype for c in allr.columns})
        elif m == "topk":
            cols = [c for c, _ in spec["order"]]
            asc = [a for _, a in spec["order"]]
            df = pd.concat(parts, ignore_index=True).sort_values(
                cols, ascending=asc, kind="mergesort"
            ).head(spec["k"]).reset_index(drop=True)
        else:
            raise ValueError(f"{name}: unknown method {m}")
        return df


def make_con():
    con = duckdb.connect()
    tune(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    con = make_con()
    sys.path.insert(0, str(Path(__file__).parent))
    rep = ReplicaEngine(REPLICAS) if REPLICAS else None
    methods = rep.spec_mod.METHODS if rep else {}
    oracles = json.loads((OUT / "oracle_sql.json").read_text())
    if ONLY:
        oracles = {k: v for k, v in oracles.items() if k in ONLY}
    verdicts = {}
    # Subset re-adjudication PATCHES an existing artifact instead of
    # clobbering it: a 600 s oracle that lost its window to host load can
    # be re-run alone (--only name --json same_path) and the other 280
    # verdicts survive. Full runs (no --only) still start fresh.
    final_partial = False
    if ONLY and not JSON_PATH.exists():
        final_partial = True  # subset run, nothing to merge: partial by definition
    if ONLY and JSON_PATH.exists():
        try:
            prior_doc = json.loads(JSON_PATH.read_text())
        except Exception:
            prior_doc = {}
        prior = prior_doc.get("queries", {})
        if not prior:
            # an --only run with no mergeable prior produces a
            # subset-only artifact - never let it masquerade as full
            final_partial = True
        # Guards (r12 ADVICE): a prior artifact from a DIFFERENT SF must
        # not be laundered into this run's verdict, and a prior that was
        # itself partial keeps its partial flag through the merge —
        # otherwise a cross-SF or incomplete file silently becomes a
        # clean-looking full artifact.
        if prior and prior_doc.get("sf") != SF:
            print(f"[patch] SKIP preload: prior sf={prior_doc.get('sf')!r} "
                  f"!= current {SF!r} - output will be a PARTIAL subset "
                  f"artifact (the prior full record is being replaced)")
            prior = {}
            # nothing merged => the final artifact covers ONLY this
            # subset; without the flag it would look like a clean full
            # gate AND have clobbered the prior record silently
            final_partial = True
        elif prior_doc.get("partial"):
            final_partial = True
            print("[patch] prior artifact is PARTIAL - merged output "
                  "keeps partial=true")
        verdicts = {k: v for k, v in prior.items() if k not in ONLY}
        if verdicts:
            print(f"[patch] preloaded {len(verdicts)} prior verdicts "
                  f"from {JSON_PATH}")
    n_pass = sum(1 for v in verdicts.values() if v.get("match"))
    n_fail = sum(1 for v in verdicts.values() if not v.get("match"))
    for name in sorted(oracles):
        pq = OUT / name
        spec = methods.get(name)
        method = f"replica-{spec['method']}" if spec else "whole"
        if not pq.exists():
            print(f"FAIL {name}: no spark output at {pq}")
            verdicts[name] = {"match": False, "errors": [f"no spark output at {pq}"],
                              "method": method}
            n_fail += 1
            continue
        t0 = time.time()
        err = None
        for attempt in (0, 1):
            try:
                spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
                if spec:
                    oracle_df = rep.run(name, oracles[name], spec, timeout=TIMEOUT)
                else:
                    oracle_df = run_df(con, oracles[name], TIMEOUT)
                err = None
                break
            except OracleTimeout:
                err = OracleTimeout()
                break
            except Exception as e:
                # A spill-heavy predecessor can leave the long-lived
                # buffer pool unable to serve even a tiny allocation
                # (observed at the r12 sf10 gate: dq_drift — 0.1 s on a
                # fresh connection — died with a 260 KB "bad allocation"
                # right after a 40 GB-spill replay). A fresh connection
                # is a clean buffer pool: reconnect, retry the name ONCE.
                if attempt == 0 and "Out of Memory" in str(e):
                    print(f"[retry] {name}: DuckDB OOM on long-lived "
                          f"connection — reconnecting")
                    try:
                        con.close()
                    except Exception:
                        pass
                    con = make_con()
                    if rep:
                        # close the old engine FIRST: it holds materialized
                        # __rep_* tables (GBs at sf10) — recreating without
                        # closing doubles resident memory and killed the
                        # whole process at the r12 gate
                        try:
                            rep.con.close()
                        except Exception:
                            pass
                        rep = ReplicaEngine(REPLICAS)
                    continue
                err = e
                break
        try:
            if err is not None:
                raise err
        except OracleTimeout:
            print(f"FAIL {name}: oracle_timeout after {TIMEOUT}s ({method})")
            verdicts[name] = {"match": False, "method": method,
                              "errors": [f"oracle_timeout after {TIMEOUT}s"]}
            n_fail += 1
            JSON_PATH.write_text(json.dumps(
                {"sf": SF, "pass": n_pass, "fail": n_fail, "partial": True,
                 "queries": verdicts}, indent=1))
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            verdicts[name] = {"match": False, "method": method,
                              "errors": [f"oracle SQL error: {e}"]}
            n_fail += 1
            JSON_PATH.write_text(json.dumps(
                {"sf": SF, "pass": n_pass, "fail": n_fail, "partial": True,
                 "queries": verdicts}, indent=1))
            continue
        errs = compare(name, spark_df, oracle_df)
        verdicts[name] = {"match": not errs, "rows": len(spark_df),
                          "errors": errs, "method": method,
                          "oracle_secs": round(time.time() - t0, 1)}
        if errs:
            n_fail += 1
            print(f"FAIL {name}:")
            for e in errs[:4]:
                print(f"   {e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows, {method}, "
                  f"{verdicts[name]['oracle_secs']}s)")
        # flush verdicts incrementally: a multi-hour big-SF run that dies
        # on one pathological query must not lose every completed verdict
        JSON_PATH.write_text(json.dumps(
            {"sf": SF, "pass": n_pass, "fail": n_fail, "partial": True,
             "queries": verdicts}, indent=1))
    # queries without oracle: rows-only smoke
    produced = {p.name for p in OUT.iterdir() if p.is_dir()}
    wanted = produced if ONLY is None else produced & ONLY
    for name in sorted(wanted - set(oracles)):
        df = con.sql(f"SELECT * FROM '{OUT / name}/*.parquet'").df()
        print(f"INFO {name}: no oracle, {len(df)} rows")
    final_doc = {"sf": SF, "pass": n_pass, "fail": n_fail, "queries": verdicts}
    if final_partial:
        final_doc["partial"] = True
    JSON_PATH.write_text(json.dumps(final_doc, indent=1))
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()


