#!/bin/bash
# Run a graft main class against the sbt-compiled classes without the sbt
# lock: tools/run.sh graft.Verify /root/testdata/sf0.001 /tmp/out
set -e
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# GC: the featurize hot loop allocates ~MBs per image (decode buffers,
# rasters, descriptor arrays). ParallelGC's stop-the-world pauses measured
# ~25% of bench wall clock (300ms young + multi-second full GCs) — a serial
# fraction that caps N→4N scaling. G1 keeps pauses bounded; override with
# GRAFT_GC_OPTS if needed.
exec java $ADD_OPENS ${GRAFT_EXTRA_JAVA_OPTS:-} -Xmx${SPARK_DRIVER_MEM:-24g} \
  ${GRAFT_GC_OPTS:--XX:+UseG1GC -XX:MaxGCPauseMillis=100} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
