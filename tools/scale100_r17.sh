#!/bin/bash
# Round-17 100x campaign: one JVM per query (crash-robust; the tiling
# markers make later invocations reuse the synthesized corpus). Appends
# each run's stderr progress + stdout JSON line to the log.
#
# Targets: the three r16 headline rows re-measured under the NEW
# median-of-3 discipline (ScaleSmoke now repeats each timed region and
# commits the raw repeats in the JSON — the r16 verdict's ask, so a
# contended single-run wall can never restart a falsification debate),
# plus the new ANN quantizer REBUILD campaign row (q279).
set -u
cd /root/repo
LOG=/root/repo/scale100_r17.log
: > "$LOG"
# Freeze the classpath so a dev-loop `sbt compile` can't race a campaign
# JVM's lazy classloading.
rm -rf /tmp/graft_scale_classes
if [ -d target/scala-2.13/classes ]; then
  cp -r target/scala-2.13/classes /tmp/graft_scale_classes
else
  echo "no compiled classes at target/scala-2.13/classes — run sbt compile first" >&2
  exit 1
fi
export SPARK_GRAFT_CLASSES=/tmp/graft_scale_classes
export SPARK_GRAFT_REPLICAS=100
export SPARK_GRAFT_SHUFFLE=256
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_SCALE_REPEATS=3
for q in q260_proximity_fleet_dense q270_zorder_optimize q272_ann_campaign q279_ann_rebuild_campaign; do
  echo "=== $q start $(date -u +%H:%M:%S) ===" >> "$LOG"
  SPARK_GRAFT_ONLY=$q bash tools/scale100.sh >> "$LOG" 2>&1
  echo "=== $q exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
done
echo "=== campaign done $(date -u +%H:%M:%S) ===" >> "$LOG"
