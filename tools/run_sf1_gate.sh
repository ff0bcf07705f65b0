#!/bin/bash
# One-shot sf1 (10x) correctness gate. Regenerates the scale-up dataset
# if it is missing, runs the full Verify sweep, then adjudicates every
# registered oracle in DuckDB, writing a CORRECTNESS-style JSON.
#
#   tools/run_sf1_gate.sh [outjson]           # full registry (~18 min Spark + ~48 min DuckDB)
#   ONLY=q_salted_join,q1_pricing_summary tools/run_sf1_gate.sh  # subset (~1 min/query)
#
# See TESTDATA.md "sf1" for the GenScale replica semantics and
# BASELINE.md "Round 10" for the certified 276/276 datapoint.
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${SF1:-/tmp/graft_testdata/sf1}
OUT=${OUT:-/tmp/sf1_out}
JSON=${1:-CORRECTNESS_sf1.json}
CPUS=${SPARK_GRAFT_CPUS:-16}

if [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "== generating sf1 from /root/testdata/sf0.1 (10 replicas)"
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 $SF1 10"
fi

ONLY_ARGS=()
VERIFY_ONLY=""
if [ -n "${ONLY:-}" ]; then
  ONLY_ARGS=(--only "$ONLY")
  VERIFY_ONLY=" $ONLY"
fi

echo "== Verify at $SF1 (local[$CPUS])"
SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.Verify $SF1 $OUT$VERIFY_ONLY"

# engine-side per-query timings (r12) — see run_scale_gate.sh
if [ -f "$OUT/spark_secs.json" ]; then
  cp "$OUT/spark_secs.json" "${JSON%.json}_spark_secs.json"
fi

echo "== DuckDB adjudication"
python3 tools/check_oracle.py "$SF1" "$OUT" --skip-verify --json "$JSON" "${ONLY_ARGS[@]}"
