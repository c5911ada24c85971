#!/bin/bash
# 100x-replica ScaleSmoke for the round-13 heavy set, run from the compiled
# classpath (no sbt project lock) so the dev loop stays free.
set -u
cd /root/repo
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# prefer a frozen classpath snapshot so a dev-loop `sbt compile` can never
# race a campaign JVM's classloading mid-run
CLASSES="${SPARK_GRAFT_CLASSES:-}"
if [ -z "$CLASSES" ]; then
  if [ -d /tmp/graft_scale_classes ]; then CLASSES=/tmp/graft_scale_classes
  else CLASSES=target/scala-2.13/classes; fi
fi
exec java -Xmx24g $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.ScaleSmoke
