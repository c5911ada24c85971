package graft

import org.apache.spark.sql.SparkSession

/** Throughput harness (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Queries run in sorted name order after a session warmup, so per-query
  * numbers are comparable across rounds (the first query no longer absorbs
  * session/codegen startup).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session: scheduler, codegen compiler (incl. the
    // regex/explode-heavy text pipeline shapes), parquet footer reads
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables(spark, sfDir, "lineitem").limit(1).collect()
    import org.apache.spark.sql.functions._
    Tables(spark, sfDir, "documents").limit(64)
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .groupBy("t").count().orderBy(desc("count")).limit(5).collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val rows = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      (name, (System.nanoTime() - t0) / 1e9, rows)
    }
    val qs = results.map { case (k, secs, _) => "\"" + k + "\":" + secs }
      .mkString("{", ",", "}")
    // result-row counts alongside (separate key keeps the driver's
    // queries-as-seconds schema intact) so rec/s ratios vs BASELINE.md are
    // computable mechanically per round
    val rows = results.map { case (k, _, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
