#!/bin/bash
# Round-13 100x campaign: one JVM per query (crash-robust; the tiling
# markers make later invocations reuse the synthesized corpus). Appends
# each run's stderr progress + stdout JSON line to the log.
set -u
cd /root/repo
LOG=/root/repo/scale100_r14.log
: > "$LOG"
# Freeze the classpath so a dev-loop `sbt compile` can't race a campaign
# JVM's lazy classloading — and CREATE the snapshot if it isn't there yet
# (exporting a dangling path would make every per-query JVM die with
# ClassNotFound and the loop burn the whole campaign logging failures).
if [ ! -d /tmp/graft_scale_classes ]; then
  if [ -d target/scala-2.13/classes ]; then
    cp -r target/scala-2.13/classes /tmp/graft_scale_classes
  else
    echo "no compiled classes at target/scala-2.13/classes — run sbt compile first" >&2
    exit 1
  fi
fi
export SPARK_GRAFT_CLASSES=/tmp/graft_scale_classes
export SPARK_GRAFT_REPLICAS=100
export SPARK_GRAFT_SHUFFLE=256
export SPARK_GRAFT_CPUS=32
# Round-14 targets: the round-13 operators that only had 10x rows
# (q243 sparse-id remap, q247 WAND, q249/q250 incremental stores) plus
# the dense-fixture phrase/proximity rows whose output grows with the
# corpus (the bijection corpus keeps their output constant by
# construction — BENCH_NOTES_r13 §5).
for q in q243_bitmap_sparse q247_wand_topk q249_incremental_lexstore \
         q250_incremental_sigstore q242_phrase_search_dense \
         q244_proximity_pairs_dense; do
  echo "=== $q start $(date -u +%H:%M:%S) ===" >> "$LOG"
  SPARK_GRAFT_ONLY=$q bash tools/scale100.sh >> "$LOG" 2>&1
  echo "=== $q exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
done
echo "=== campaign done $(date -u +%H:%M:%S) ===" >> "$LOG"
