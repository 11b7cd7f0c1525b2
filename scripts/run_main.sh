#!/bin/bash
# Run a graft main (graft.Bench / graft.Verify) with the SAME JVM options
# sbt's forked run uses (build.sbt javaOptions), but without holding the
# sbt project lock — lets a long bench run coexist with compiles.
# Usage: run_main.sh <mainClass> [args...]   (env passes through)
set -eu
MAIN="$1"; shift
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
GCLOG=""
if [ -n "${SPARK_GRAFT_GCLOG:-}" ]; then GCLOG="-Xlog:gc:${SPARK_GRAFT_GCLOG}"; fi
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" -XX:ReservedCodeCacheSize=1g $GCLOG \
  -cp "$CP" "$MAIN" "$@"
