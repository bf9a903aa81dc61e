#!/bin/bash
# Quad-executor scaling control — the cluster-shaped half of the N->4N
# protocol in BENCH/BASELINE.md: four CONCURRENT local[8] JVMs pinned to
# disjoint core ranges (0-7 / 8-15 / 16-23 / 24-31), each the same job.
# sbt cannot host four concurrent runs of one project (server lock), so
# this launches the compiled classes directly with the same JVM flags
# build.sbt injects for forked runs. Run `sbt -batch compile` first.
#
# Usage: BENCH/scaling_quad.sh [pages] [passes]   (defaults 6000000, 2)
set -e
cd "$(dirname "$0")/.."
PAGES=${1:-6000000}
PASSES=${2:-2}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
PIDS=()
for i in 0 1 2 3; do
  LO=$((i * 8)); HI=$((i * 8 + 7))
  taskset -c $LO-$HI java -Xms20g -Xmx20g -XX:+AlwaysPreTouch \
    -XX:+UseParallelGC -XX:ActiveProcessorCount=8 $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.ScalingBench 8 "$PAGES" 256 "$PASSES" \
    > "/tmp/scaling_quad_$i.log" 2>&1 &
  PIDS+=($!)
done
RC=0
for p in "${PIDS[@]}"; do wait "$p" || RC=1; done
grep -h '"bench":"scaling"' /tmp/scaling_quad_*.log
exit $RC
