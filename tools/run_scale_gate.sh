#!/bin/bash
# Parameterized N-replica correctness gate (generalizes run_sf1_gate.sh).
# Regenerates the scale-up dataset if missing, runs Verify on a subset (or
# the full registry), then adjudicates each oracle in DuckDB.
#
#   tools/run_scale_gate.sh <replicas> <dstdir> <outjson> [only1,only2,...]
#   tools/run_scale_gate.sh 100 /tmp/graft_testdata/sf10 CORRECTNESS_sf10_subset.json "$(cat tools/sf10_subset.txt | tr '\n' ',' | sed 's/,$//')"
#
# The sf10 (100x sf0.1) point is meant to run as a SUBSET gate: a full
# 279-query DuckDB adjudication at 60M lineitem rows would take hours;
# tools/sf10_subset.txt picks ~29 representative/heavy queries across all
# families. See BASELINE.md "Round 10" for the recorded datapoints.
set -euo pipefail
cd "$(dirname "$0")/.."

REPLICAS=${1:?replicas (e.g. 100)}
DST=${2:?dst dir (e.g. /tmp/graft_testdata/sf10)}
JSON=${3:?output json (e.g. CORRECTNESS_sf10_subset.json)}
ONLY=${4:-}
OUT=${OUT:-/tmp/scale_out_$REPLICAS}
CPUS=${SPARK_GRAFT_CPUS:-16}

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

echo "== DuckDB adjudication"
python3 tools/check_oracle.py "$DST" "$OUT" --skip-verify --json "$JSON" "${ONLY_ARGS[@]}"
