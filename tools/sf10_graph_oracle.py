#!/usr/bin/env python3
"""Exact DuckDB adjudication of the two graph-family entries at the 100x
(sf10) point, where the registered whole-table oracle replay is
single-node-infeasible (the co-purchase pair DISTINCT alone is a ~900M-row
hash that spilled >60 GB of DuckDB temp on this box).

The GenScale corpus decomposes by construction: replica r's orders
reference only replica r's parts (keys offset by r x a per-domain
constant), so the co-purchase graph is 100 disjoint subgraphs and both
queries can be adjudicated replica-by-replica at sf0.1 cost each:

  - the PREMISE (no cross-replica edge) is verified from the data itself
    with one linear scan, not assumed;
  - graph_pagerank: per-replica 3-iteration integer fixed point with the
    GLOBAL n constants (n = total node count across replicas, computed
    first); concatenating the 100 per-replica results IS the full oracle
    result, compared row-exact against the Spark parquet output;
  - graph_triangles: the md5 edge sample is NOT replica-equivariant (the
    hash sees the offset keys), so each replica slice is computed with its
    own keys and the three output scalars are summed across replicas
    (triangles never span replicas).

This is the same oracle-from-generator-structure pattern as the
mm_phash_dedup inverted-range derivation: an independent computation that
exploits documented data symmetry instead of replaying the engine's work
at full volume.

Usage: python3 tools/sf10_graph_oracle.py [sfdir] [outdir] [--json path]
           [--replicas N]

--replicas 10 against the sf1 dirs self-tests the script: there the
full-table oracle replay IS feasible and the registered gate already
adjudicated both queries green, so the per-replica derivation must
reproduce PASS/PASS.
"""
import json
import sys

import duckdb
import pandas as pd

sys.stdout.reconfigure(line_buffering=True)

POS = [a for i, a in enumerate(sys.argv[1:], start=1)
       if not a.startswith("--") and sys.argv[i - 1] not in ("--json", "--replicas")]
SF = POS[0] if len(POS) > 0 else "/tmp/graft_testdata/sf10"
OUT = POS[1] if len(POS) > 1 else "/tmp/scale_out_100"
JSON_PATH = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv \
    else "/tmp/sf10_graph.json"
ORD_OFF = 1_000_000   # GenScale.OrdOff
PART_OFF = 100_000    # GenScale.PartOff
REPLICAS = int(sys.argv[sys.argv.index("--replicas") + 1]) \
    if "--replicas" in sys.argv else 100

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")

verdicts = {}


def check(name, ok, rows, errs):
    verdicts[name] = {"match": bool(ok), "rows": int(rows), "errors": errs}
    print(("PASS" if ok else "FAIL") + f" {name}" +
          (f" ({rows} rows)" if ok else f": {errs[:2]}"))


# ---- premise: the graph decomposes by replica ---------------------------
bad = con.execute(
    f"SELECT count(*) FROM lineitem "
    f"WHERE l_orderkey // {ORD_OFF} != l_partkey // {PART_OFF}").fetchone()[0]
n_reps = con.execute(
    f"SELECT count(DISTINCT l_orderkey // {ORD_OFF}) FROM lineitem").fetchone()[0]
print(f"premise: cross-replica rows={bad}, replicas={n_reps}")
assert bad == 0 and n_reps == REPLICAS, "replica decomposition premise violated"

# per-replica edge CTE over the slice; keys keep their replica offsets so
# the md5 sample and the output node ids match the engine's exactly
EDGE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey >= {lo} AND l_orderkey < {hi}),
e1 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey),
e AS (SELECT src, dst FROM e1 UNION ALL SELECT dst AS src, src AS dst FROM e1),
deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1)
"""


def rep_sql(r, body):
    return EDGE.format(lo=r * ORD_OFF, hi=(r + 1) * ORD_OFF) + body


# ---- pass 1: global n (node count summed over replicas) -----------------
n_global = 0
for r in range(REPLICAS):
    n_global += con.execute(rep_sql(r, "SELECT count(*) FROM deg")).fetchone()[0]
print(f"n_global={n_global}")

# ---- graph_pagerank ------------------------------------------------------
# identical expression tree to the registered oracle (oracle_sql.json),
# with n fixed to the global constant and the scan sliced per replica
PR_BODY = """
, pr0 AS (SELECT node, deg, 1000000000000 // {n} AS pr_fix FROM deg),
pr1 AS (
  SELECT d.node, d.deg,
    150000000000 // {n} + (85 * CAST(sum(p.pr_fix // p.deg) AS BIGINT)) // 100 AS pr_fix
  FROM e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.node = e.dst
  GROUP BY d.node, d.deg),
pr2 AS (
  SELECT d.node, d.deg,
    150000000000 // {n} + (85 * CAST(sum(p.pr_fix // p.deg) AS BIGINT)) // 100 AS pr_fix
  FROM e JOIN pr1 p ON p.node = e.src JOIN deg d ON d.node = e.dst
  GROUP BY d.node, d.deg),
pr3 AS (
  SELECT d.node, d.deg,
    150000000000 // {n} + (85 * CAST(sum(p.pr_fix // p.deg) AS BIGINT)) // 100 AS pr_fix
  FROM e JOIN pr2 p ON p.node = e.src JOIN deg d ON d.node = e.dst
  GROUP BY d.node, d.deg)
SELECT node, CAST(deg AS BIGINT) AS deg,
  CAST(pr_fix * {n} AS BIGINT) AS pr_norm_e12,
  CAST(pr_fix * {n} AS DOUBLE) / 1e12 AS pr_norm
FROM pr3 ORDER BY node
"""
parts = []
for r in range(REPLICAS):
    parts.append(con.execute(rep_sql(r, PR_BODY.format(n=n_global))).df())
    if (r + 1) % 20 == 0:
        print(f"pagerank replica {r + 1}/{REPLICAS}")
oracle_pr = pd.concat(parts, ignore_index=True).sort_values("node").reset_index(drop=True)
spark_pr = con.sql(
    f"SELECT * FROM '{OUT}/graph_pagerank/*.parquet' ORDER BY node").df()
errs = []
if list(spark_pr.columns) != list(oracle_pr.columns):
    errs.append(f"cols spark={list(spark_pr.columns)} oracle={list(oracle_pr.columns)}")
elif len(spark_pr) != len(oracle_pr):
    errs.append(f"rows spark={len(spark_pr)} oracle={len(oracle_pr)}")
else:
    for c in spark_pr.columns:
        neq = (spark_pr[c] != oracle_pr[c]).sum()
        if neq:
            i = (spark_pr[c] != oracle_pr[c]).idxmax()
            errs.append(f"value[{c}] {neq} diffs; first row {i}: "
                        f"spark={spark_pr[c].iloc[i]!r} oracle={oracle_pr[c].iloc[i]!r}")
check("graph_pagerank", not errs, len(spark_pr), errs)

# ---- graph_triangles -----------------------------------------------------
TRI_BODY = """
, samp AS (SELECT src, dst FROM e1
  WHERE ('0x' || substr(md5(src::VARCHAR || '|' || dst::VARCHAR), 1, 15))::UBIGINT % 8 = 0),
sdeg AS (SELECT n, count(*) AS deg FROM (
    SELECT src AS n FROM samp UNION ALL SELECT dst AS n FROM samp)
  GROUP BY 1),
o AS (
  SELECT CASE WHEN skey < dkey THEN src ELSE dst END AS u,
    CASE WHEN skey < dkey THEN dst ELSE src END AS v,
    greatest(skey, dkey) AS vkey
  FROM (
    SELECT s.src, s.dst,
      ds.deg * 1099511627776 + s.src AS skey,
      dd.deg * 1099511627776 + s.dst AS dkey
    FROM samp s JOIN sdeg ds ON ds.n = s.src JOIN sdeg dd ON dd.n = s.dst)),
w AS (
  SELECT a.v AS x, b.v AS y FROM o a JOIN o b ON a.u = b.u
  WHERE a.vkey < b.vkey),
t AS (
  SELECT count(*) AS n_tri FROM w
  WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.x AND o.v = w.y))
SELECT (SELECT count(*) FROM samp) AS n_edges_sampled, t.n_tri AS n_tri_sampled FROM t
"""
tot_edges = tot_tri = 0
for r in range(REPLICAS):
    ne, nt = con.execute(rep_sql(r, TRI_BODY)).fetchone()
    tot_edges += ne
    tot_tri += nt
    if (r + 1) % 20 == 0:
        print(f"triangles replica {r + 1}/{REPLICAS}")
spark_tri = con.sql(f"SELECT * FROM '{OUT}/graph_triangles/*.parquet'").df()
exp = {"n_edges_sampled": tot_edges, "n_tri_sampled": tot_tri,
       "est_total": tot_tri * 512}
errs = []
if len(spark_tri) != 1:
    errs.append(f"rows spark={len(spark_tri)} oracle=1")
else:
    for c, v in exp.items():
        got = int(spark_tri[c].iloc[0])
        if got != v:
            errs.append(f"value[{c}] spark={got} oracle={v}")
check("graph_triangles", not errs, len(spark_tri), errs)

with open(JSON_PATH, "w") as f:
    json.dump({"sf": SF, "pass": sum(v["match"] for v in verdicts.values()),
               "fail": sum(not v["match"] for v in verdicts.values()),
               "queries": verdicts}, f, indent=1)
print(f"wrote {JSON_PATH}")
sys.exit(0 if all(v["match"] for v in verdicts.values()) else 1)
