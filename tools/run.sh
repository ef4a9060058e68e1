#!/bin/bash
# Direct-JVM runner for graft mains — same flags build.sbt gives forked
# runs, but without sbt (so several probes can run concurrently with no
# sbt target-lock contention). Compile first: `sbt compile`.
# Usage: tools/run.sh <MainClass> [args...]
#   env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_* as usual
set -euo pipefail
CP="$(cd "$(dirname "$0")/.." && pwd)/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
