#!/usr/bin/env bash
# Fresh-JVM graft.Bench runner against an arbitrary table directory —
# builder-local tooling for SCALE.md headroom measurements (one bare JVM
# per invocation, no sbt startup in the timing path).
#
# Usage: tools/bench_dir.sh <table-dir> [query-substring ...]
# Env:   MEM  driver heap (default 8g; heavy graph builds want 96g)
#        RUNS samples per query, min reported (default 2 — matching
#             Bench.scala's default; at RUNS=1 the spread/spread_total
#             noise floor is vacuously 0, defeating the round-12 fix)
#        CPUS local[] threads (default 32)
#        OUT  bench JSON path. Default: BENCH_LOCAL.json for a FULL run,
#             a /tmp scratch file for a FILTERED run — a partial run must
#             never clobber the canonical full-suite record (that is
#             exactly how a filtered 8-query JSON got committed in r12).
set -euo pipefail
DIR=$1; shift
if [[ $# -gt 0 ]]; then
  BENCH_OUT="${OUT:-$(mktemp /tmp/bench_filtered_XXXX.json)}"
else
  BENCH_OUT="${OUT:-BENCH_LOCAL.json}"
fi
echo "[bench_dir] writing $BENCH_OUT" >&2
OPENS=(java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch
  java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=("--add-opens=$p=ALL-UNNAMED"); done
# fixed pre-touched heap: lazy G1 heap growth under the default -Xms
# cost 100-270 s of GC on heavy queries and swung identical runs 2-8x
# (round-13 NND A/B: 298 s -> 42 s from these flags alone)
SPARK_GRAFT_SF_DIR="$DIR" \
SPARK_GRAFT_BENCH_RUNS="${RUNS:-2}" \
SPARK_GRAFT_CPUS="${CPUS:-32}" \
SPARK_GRAFT_BENCH_OUT="$BENCH_OUT" \
exec java "${FLAGS[@]}" "-Xms${MEM:-8g}" "-Xmx${MEM:-8g}" -XX:+AlwaysPreTouch \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench "$@"
