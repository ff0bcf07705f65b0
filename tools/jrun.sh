#!/bin/bash
# Run a graft main class directly on the compiled classes + /opt/spark/jars,
# bypassing sbt (which serializes on project locks — two concurrent
# `sbt runMain` invocations contend; two plain JVMs don't). Compile first:
#   sbt -batch compile
#   tools/jrun.sh graft.Verify /tmp/graft_testdata/sf1 /tmp/sf1_out
# JVM flags mirror build.sbt's `run / javaOptions` (Spark 4 on JDK 17
# needs the add-opens when SparkSession is built outside spark-submit).
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=(java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
