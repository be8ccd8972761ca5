#!/bin/bash
# Direct-java bench runner (no sbt JVM measuring interference).
# Usage: bench.sh <out.json> [only-queries-csv] [cpus] [sfdir]
OUT="${1:-/root/repo/BENCH_DETAIL_r18.json}"
ONLY="${2:-}"
CPUS="${3:-32}"
SF="${4:-/root/testdata/sf0.1}"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ENV_ONLY=""
if [ -n "$ONLY" ]; then export SPARK_GRAFT_ONLY="$ONLY"; fi
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_BENCH_OUT="$OUT" \
exec java $ADDOPENS -Xmx48g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench
