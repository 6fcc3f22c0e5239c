#!/bin/bash
# Direct-JVM bench runner — identical flags to build.sbt's fork settings
# (sbt works too but pays JVM + sbt startup per run; this is the loop-fast
# path used for the A/B and scale spot-benches).
#
#   tools/bench.sh [sfDir] [runs] [only]
#   tools/bench.sh bench-data/sf10 3 d_jaccard,d_simhash_pairs
#
# Pass extra -D spark confs via BENCH_JVM_EXTRA.
set -eu
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
RUNS=${2:-3}
ONLY=${3:-}
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# an EMPTY SPARK_GRAFT_BENCH_ONLY would filter out every query — only
# export the subset var when one was actually requested
if [ -n "$ONLY" ]; then export SPARK_GRAFT_BENCH_ONLY="$ONLY"; fi
# The enlarged code cache is load-bearing: the default 240m exhausts under
# the sweep's codegen churn and flips hot stages to the interpreter; at 244
# queries even 512m pressured the mid-suite graph family (round-8 A/B)
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_RUNS="$RUNS" \
exec java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  -Xmx48g -XX:ReservedCodeCacheSize=768m -Dspark.sql.session.timeZone=UTC \
  ${BENCH_JVM_EXTRA:-} $OPENS graft.Bench
