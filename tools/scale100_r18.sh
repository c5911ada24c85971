#!/bin/bash
# Round-18 100x campaign: one JVM per query (crash-robust; the tiling
# markers make later invocations reuse the synthesized corpus). Appends
# each run's stderr progress + stdout JSON line to the log.
#
# Targets: the r17 headline rows re-measured on the r18 code (q260 scan
# +join axis, q270 layout maintenance, q272 ANN store, q279 quantizer
# rebuild — now the HARDENED multi-iteration rebuild with the recall
# gate in the timed region), plus the NEW feed catch-up campaign (q286):
# a fresh lexical store bootstrapped from a 120-commit feed through the
# grouped-scan readChangeFeed + the net-effect apply — the round's weak
# fix priced at scale.
set -u
cd /root/repo
LOG=/root/repo/scale100_r18.log
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
for q in q260_proximity_fleet_dense q270_zorder_optimize q272_ann_campaign \
         q279_ann_rebuild_campaign q286_feed_catchup_campaign; do
  echo "=== $q start $(date -u +%H:%M:%S) ===" >> "$LOG"
  SPARK_GRAFT_ONLY=$q bash tools/scale100.sh >> "$LOG" 2>&1
  echo "=== $q exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
done
echo "=== campaign done $(date -u +%H:%M:%S) ===" >> "$LOG"
