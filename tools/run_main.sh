#!/usr/bin/env bash
# Run a graft main against the compiled classes without sbt (same JVM
# flags build.sbt forks with). Usage: tools/run_main.sh graft.Bench [args...]
# Env knobs pass through (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_BENCH_REPS, ...).
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift || true
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
