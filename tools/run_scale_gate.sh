#!/bin/bash
# Parameterized N-replica correctness gate (generalizes run_sf1_gate.sh).
# Regenerates the scale-up dataset if missing, runs Verify on a subset (or
# the full registry), then adjudicates each oracle in DuckDB.
#
#   tools/run_scale_gate.sh <replicas> <dstdir> <outjson> [only1,only2,...]
#   tools/run_scale_gate.sh 100 /tmp/graft_testdata/sf10 CORRECTNESS_sf10.json
#
# At the sf10 (100x sf0.1) point the whole-table DuckDB replay is
# single-node-infeasible for the co-purchase graph family (the pair
# DISTINCT spilled >60 GB and died) — check_oracle.py handles those
# itself via --replicas: the queries named in tools/sf10_methods.py are
# adjudicated by per-replica replay of the UNCHANGED oracle SQL over
# replica-sliced views (the tools/sf10_graph_oracle.py pattern,
# generalized and self-tested at sf1), every verdict carrying a "method"
# field; everything else stays whole-table with a per-oracle --timeout
# so one pathological replay can't hang the gate. See BASELINE.md
# "Round 10"/"Round 11" for the recorded datapoints.
set -euo pipefail
cd "$(dirname "$0")/.."

REPLICAS=${1:?replicas (e.g. 100)}
DST=${2:?dst dir (e.g. /tmp/graft_testdata/sf10)}
JSON=${3:?output json (e.g. CORRECTNESS_sf10.json)}
ONLY=${4:-}
OUT=${OUT:-/tmp/scale_out_$REPLICAS}
CPUS=${SPARK_GRAFT_CPUS:-16}
# 900 not 600: the dedup_cdc_chunks linear replay legitimately costs
# ~600 s of DuckDB window machinery at sf10 (500M char rows) — a budget
# sitting ON the clean-box cost flaps with the first puff of host load.
ORACLE_TIMEOUT=${ORACLE_TIMEOUT:-900}
DUCK_MEM=${DUCK_MEM:-48GB}
# Scale sweeps need a scale-sized driver heap: build.sbt's 8g default
# OOMs at the 100x point (graph_common_neighbors' wedge stage with 32
# executor threads died there at r12) — the one-shot command must not
# depend on the caller remembering to export it.
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g}

# DuckDB's buffer manager maps ~256 KB blocks individually, so a 48 GB
# pool wants ~200k VM maps; the kernel default vm.max_map_count=65530
# caps the pool at ~16 GB and the NEXT allocation dies with a KB-sized
# "bad allocation" (r12 gate: dedup_span_scrub's replay parked the
# process at exactly 65531 maps and everything after it OOM'd while the
# box had 119 GB free). Raise it if we can; warn if we can't.
if [ "$(cat /proc/sys/vm/max_map_count 2>/dev/null || echo 0)" -lt 262144 ]; then
  sysctl -w vm.max_map_count=1048576 2>/dev/null \
    || echo "WARN: vm.max_map_count low and not raisable - big replays may OOM spuriously"
fi

if [ ! -f "$DST/lineitem.parquet" ]; then
  echo "== generating ${REPLICAS}x replicas of /root/testdata/sf0.1 -> $DST"
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 $DST $REPLICAS"
fi

ONLY_ARGS=()
VERIFY_ONLY=""
if [ -n "$ONLY" ]; then
  ONLY_ARGS=(--only "$ONLY")
  VERIFY_ONLY=" $ONLY"
fi

echo "== Verify at $DST (local[$CPUS])"
SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.Verify $DST $OUT$VERIFY_ONLY"

# Engine-side per-query timings (r12): Verify writes spark_secs.json
# (per-query sec + window canaries, min-of-1-with-write) alongside the
# dumps; keep a copy next to the correctness JSON so the round records
# BOTH sides' cost — oracle_secs lives inside $JSON, spark side here.
if [ -f "$OUT/spark_secs.json" ]; then
  cp "$OUT/spark_secs.json" "${JSON%.json}_spark_secs.json"
fi

echo "== DuckDB adjudication (replica derivations for tools/sf10_methods.py entries)"
python3 tools/check_oracle.py "$DST" "$OUT" --skip-verify --json "$JSON" \
  --replicas "$REPLICAS" --timeout "$ORACLE_TIMEOUT" --mem "$DUCK_MEM" \
  --threads "$CPUS" "${ONLY_ARGS[@]}"
