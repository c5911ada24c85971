package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism rebalance for FAN-OUT pipelines — operators that
  * multiply per-row work inside the scan stage (a ×B replicate explode, a
  * per-row hash draw per replicate, patch/shingle generation) before any
  * shuffle. Spark parallelizes a scan by file split, and a split cannot
  * cut inside a parquet row group: a table written as few large row groups
  * scans as few tasks, and the fan-out work — B× the scan's row count —
  * runs at the SPLIT count, not the cluster's core count.
  *
  * On a 100 TB table this never fires: millions of row groups give the
  * scan stage more splits than cores, and `rebalance` is an exact no-op
  * (no shuffle is added to the plan). It exists for the opposite regime —
  * a source whose split count is BELOW the session's parallelism (one
  * ingest file, a small dimension feeding a ×B explode) — where one
  * row-count-sized exchange of the narrow input is strictly cheaper than
  * running B× that work on a handful of cores. The round-robin repartition
  * preserves row multiplicity and touches no keys, so downstream
  * semantics (including deterministic per-row hash draws) are unchanged.
  */
object Fanout {

  /** Repartition `df` to the session's default parallelism IFF its
    * physical scan would run with fewer splits than that; otherwise return
    * it untouched (the common case at scale — no plan change at all).
    * Call it on the NARROW side, before the fan-out, so the exchange
    * carries input rows, never the multiplied output.
    */
  def rebalance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // physical split count without executing: compile the plan once
    val splits = df.queryExecution.toRdd.getNumPartitions
    if (splits < target) df.repartition(target) else df
  }
}
