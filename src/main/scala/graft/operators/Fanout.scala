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
    *
    * PRECONDITION (enforced): `df` must be scan-only — projections and
    * filters over a leaf source, no join/aggregate/window/exchange. The
    * split-count probe compiles the physical plan and instantiates its
    * RDD; under AQE (default-on in Spark 4) a plan containing exchanges
    * would eagerly EXECUTE its intermediate query stages at probe time on
    * a throwaway QueryExecution — the upstream query would run twice. For
    * scan-only plans there are no query stages, so the probe only plans
    * file splits (no job runs).
    */
  def rebalance(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project}
    val scanOnly = df.queryExecution.optimizedPlan.collect { case p => p }
      .forall {
        case _: Project | _: Filter | _: LeafNode => true
        case _ => false
      }
    require(scanOnly,
      "Fanout.rebalance requires a scan-only input (project/filter over a " +
        "leaf); a plan with joins/aggregates/exchanges would execute its " +
        "query stages twice under AQE's split-count probe")
    val target = df.sparkSession.sparkContext.defaultParallelism
    // physical split count without executing: compile the plan once
    val splits = df.queryExecution.toRdd.getNumPartitions
    if (splits < target) df.repartition(target) else df
  }
}
