#!/usr/bin/env python3
"""Self-test of check_oracle.py's per-replica derivation engine: on a
replica corpus SMALL enough that the whole-table DuckDB replay is
feasible, every tools/sf10_methods.py spec must reproduce the whole-table
result frame-exactly (same compare as the gate).

Run it on a corpus where both sides are cheap:

    sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.01 /tmp/graft_testdata/rep3 3"
    python3 tools/selftest_replica_oracle.py /tmp/graft_testdata/rep3 3

and/or at sf1 (10 replicas), where the whole-table side needs a quiet box
and ~50 GB of spill headroom for graph_pagerank/graph_triangles:

    python3 tools/selftest_replica_oracle.py /tmp/graft_testdata/sf1 10

Round-11 record: 12/12 PASS at rep3 (3x sf0.01); 9/12 also PASS at sf1
before the whole-table side (not the derivation) ran the box out of disk
— the three heavy ones are covered by the rep3 run plus, for
pagerank/triangles, agreement with the independent
tools/sf10_graph_oracle.py derivation at sf10.

Needs /tmp/verify_out/oracle_sql.json (any check_oracle run leaves one;
the oracle SQL map is SF-independent).
"""
import json
import sys
import time
from pathlib import Path

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_testdata/rep3"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ORACLES = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_out/oracle_sql.json"
# Optional 4th arg: comma-separated method subset (re-run just the names a
# previous pass couldn't finish, e.g. the sf1 whole-table spill victims).
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

sys.argv = ["check_oracle.py", SF, "/tmp/verify_out", "--skip-verify",
            "--replicas", str(R), "--mem", "24GB", "--threads", "16"]
sys.path.insert(0, str(Path(__file__).parent))
import duckdb  # noqa: E402

import check_oracle as co  # noqa: E402

sys.stdout.reconfigure(line_buffering=True)
con = duckdb.connect()
co.tune(con)
con.execute("SET temp_directory='/tmp/duck_spill'")
# Cap the whole-table side's spill so a pathological DISTINCT degrades to
# an error for THAT name instead of filling the disk and killing the box
# (the r11 sf1 run lost 3 names this way). The graph trio's whole-table
# side at sf1 legitimately needs ~60GB — raise via DUCK_TEMP_CAP when the
# disk has room.
import os
con.execute(f"SET max_temp_directory_size='{os.environ.get('DUCK_TEMP_CAP', '40GB')}'")
for t in co.TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
rep = co.ReplicaEngine(R)
rep.con.execute("SET temp_directory='/tmp/duck_spill'")
oracles = json.loads(Path(ORACLES).read_text())
fails = 0
# prove gate-active AND gate-disabled (fallback) specs alike
ALL_SPECS = {**rep.spec_mod.METHODS,
             **getattr(rep.spec_mod, "FALLBACK_METHODS", {})}
for name in sorted(ALL_SPECS):
    if ONLY is not None and name not in ONLY:
        continue
    sql = oracles[name]
    t0 = time.time()
    try:
        whole = con.sql(sql).df()
    except Exception as e:
        print(f"SKIP {name}: whole-table side infeasible here ({type(e).__name__}: "
              f"{str(e)[:120]}) — not a derivation verdict")
        continue
    t1 = time.time()
    derived = rep.run(name, sql, ALL_SPECS[name])
    t2 = time.time()
    errs = co.compare(name, whole, derived)
    print(("PASS" if not errs else "FAIL") +
          f" {name} whole={t1 - t0:.1f}s derived={t2 - t1:.1f}s rows={len(whole)}")
    for e in errs[:4]:
        print("   ", e)
    fails += bool(errs)
print(f"done, {fails} fails")
sys.exit(1 if fails else 0)
