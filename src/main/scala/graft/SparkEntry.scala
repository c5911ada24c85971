package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{CorpusOps, Curation, Dedup, EventsOps, GraphOps, IngestOps, LayoutOps, MiningOps, MultimodalOps, Relational, Similarity, SketchOps, Temporal, TextOps, TpchStyle, TrainPrep}

/** Driver contract — see SURVEY.md §7 and the stub comments. */
object SparkEntry {

  /** Flagship query on sf0.001: the star join + grouped aggregation of
    * SURVEY.md §7.3 — lineitem⋈orders⋈customer⋈nation with broadcast dims.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val l = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** One entry per implemented operator (SURVEY.md §2a fidelity +
    * §2b relational/extension surface).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ EventsOps.all ++ TextOps.all ++ Dedup.all ++
      Similarity.all ++ IngestOps.all ++ Temporal.all ++ Curation.all ++ TpchStyle.all ++ MultimodalOps.all ++ TrainPrep.all ++ CorpusOps.all ++ GraphOps.all ++ LayoutOps.all ++ SketchOps.all ++ MiningOps.all

  /** The `SPARK_GRAFT_ONLY=q46,q55` local-iteration filter Bench and
    * Verify share: keep queries whose name starts with any listed prefix;
    * unset (the driver's invocation) keeps everything.
    */
  def onlyFilter(): String => Boolean = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    name => only.forall(_.exists(name.startsWith))
  }

  /** DuckDB-runnable oracle SQL per query; hash-heavy signature queries are
    * intentionally omitted (rows-only check).
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventsOps.oracles ++ TextOps.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ IngestOps.oracles ++ Temporal.oracles ++ Curation.oracles ++ TpchStyle.oracles ++ MultimodalOps.oracles ++ TrainPrep.oracles ++ CorpusOps.oracles ++ GraphOps.oracles ++ LayoutOps.oracles ++ SketchOps.oracles ++ MiningOps.oracles
}
