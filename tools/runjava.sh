#!/bin/bash
# Run a graft main class without sbt (classpath = compiled classes + Spark
# jars), with the same JVM flags build.sbt passes to forked runs. Usage:
#   tools/runjava.sh graft.Bench [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Mirror build.sbt's heap right-sizing: cap at 16g (huge heaps page-fault
# allocation-heavy queries through fresh 4K pages — see build.sbt).
REQ="${SPARK_DRIVER_MEM:-8g}"
GB="${REQ%[gG]}"
if [[ "$REQ" == *m || "$REQ" == *M ]]; then GB=$(( (${REQ%[mM]} + 1023) / 1024 )); fi
if ! [[ "$GB" =~ ^[0-9]+$ ]]; then GB=8; fi
if (( GB > 16 )); then GB=16; fi
if (( GB < 4 )); then GB=4; fi
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xms"${GB}g" -Xmx"${GB}g" -XX:+AlwaysPreTouch \
  -XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing \
  -cp "$CP" "$@"
