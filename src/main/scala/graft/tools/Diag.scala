package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic — not part of the library surface. */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def session(rewrite: Boolean): SparkSession = {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      if (rewrite) graft.plans.TopK.enableRewrite(spark)
      spark
    }
    val q = sys.env.getOrElse("DIAG_Q", "q224_poisson_bootstrap")
    val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (sys.env.contains("DIAG_R9")) q224r9 _ else graft.SparkEntry.queries(q)
    // one JVM, rewrite toggled via experimental methods churn is awkward;
    // run OFF first, then enable, then run again (enable only adds the rule)
    val spark = session(rewrite = false)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time3(tag: String): Unit = {
      (1 to 3).foreach { i =>
        graft.Bench.coldSweep(spark)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[diag] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    if (sys.env.contains("DIAG_EXPLAIN")) {
      println("[diag] ===== HEAD plan ====="); fn(spark, sfDir).explain("formatted")
      println("[diag] ===== r9 plan ====="); q224r9(spark, sfDir).explain("formatted")
    } else if (sys.env.contains("DIAG_VARIANTS")) {
      def timeV(tag: String, f: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
        (1 to 3).foreach { i =>
          graft.Bench.coldSweep(spark)
          val t0 = System.nanoTime()
          val n = f(spark, sfDir).count()
          println(f"[diag] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        }
      val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          stages += ((i.stageId, i.taskMetrics.executorRunTime, i.numTasks,
            i.name.take(60)))
        }
      })
      def dump(tag: String): Unit = {
        stages.sortBy(-_._2).take(6).foreach { case (id, rt, nt, nm) =>
          println(f"[diag]   $tag stage=$id runTime=${rt}ms tasks=$nt $nm")
        }
        stages.clear()
      }
      timeV("r9        ", q224r9 _); dump("r9")
      timeV("+filter   ", q224v(useFilter = true, countWin = false, exprRank = false))
      dump("+filter")
      def executed(tag: String,
          f: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
        val df = f(spark, sfDir); df.count()
        println(s"[diag] ===== $tag executed =====")
        println(df.queryExecution.executedPlan.toString.take(8000))
      }
      // isolate: the aggregate subtree alone, with vs without the filter
      import org.apache.spark.sql.functions._
      import graft.queries.Curation.{Q224Reps, Q224PoissonCdf}
      val h60 = graft.functions.ColFns.h60 _
      val cdfCase = Q224PoissonCdf.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN ${k}L" }
        .mkString("CASE ", " ", " ELSE 7L END")
      def reps0() = graft.Tables(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("b", explode(array((0 until Q224Reps).map(lit(_)): _*)))
        .withColumn("u", (h60(concat_ws(":", lit("boot"), col("b"), col("event_id"))) /
          lit(1152921504606846976.0)))
        .withColumn("w", expr(cdfCase))
        .groupBy(col("event_type"), col("b"))
        .agg(sum(col("w")).as("wn"), sum(col("w") * col("cents")).as("wsum"))
      def timeDf(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit =
        (1 to 3).foreach { i =>
          graft.Bench.coldSweep(spark)
          val t0 = System.nanoTime()
          val n = mk().count()
          println(f"[diag] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        }
      timeDf("agg-only   ", () => reps0())
      dump("agg-only")
      timeDf("agg+filter ", () => reps0().filter(col("wn") > 0))
      dump("agg+filter")
      timeDf("agg+filter2", () => reps0().filter(col("wn") > 0)
        .withColumn("rep_mean_milli", expr("1000 * wsum div wn")))
      dump("agg+filter2")
    } else {
      time3("rewrite=off")
      graft.plans.TopK.enableRewrite(spark)
      time3("rewrite=on ")
    }
    spark.stop()
  }

  /** Parameterized q224 for bisecting which HEAD delta costs the wall. */
  def q224v(useFilter: Boolean, countWin: Boolean, exprRank: Boolean)(
      spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.queries.Curation.{Q224Reps, Q224PoissonCdf}
    val h60 = graft.functions.ColFns.h60 _
    val cdfCase = Q224PoissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 7L END")
    val e = graft.Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val drawn = e
      .withColumn("b", explode(array((0 until Q224Reps).map(lit(_)): _*)))
      .withColumn("u", (h60(concat_ws(":", lit("boot"), col("b"), col("event_id"))) /
        lit(1152921504606846976.0)))
      .withColumn("w", expr(cdfCase))
    val reps0 = drawn.groupBy(col("event_type"), col("b"))
      .agg(sum(col("w")).as("wn"), sum(col("w") * col("cents")).as("wsum"))
    val reps = (if (useFilter) reps0.filter(col("wn") > 0) else reps0)
      .withColumn("rep_mean_milli", expr("1000 * wsum div wn"))
    val wRk = Window.partitionBy(col("event_type"))
      .orderBy(col("rep_mean_milli"), col("b"))
    val ranked0 = reps.withColumn("rk", row_number().over(wRk))
    val ranked = if (countWin)
      ranked0.withColumn("nreps",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
    else ranked0
    val ci = if (exprRank)
      ranked.groupBy(col("event_type")).agg(
        max(when(col("rk") === expr("(nreps * 5) div 100 + 1"),
          col("rep_mean_milli"))).as("boot_lo_milli"),
        max(when(col("rk") === expr("nreps - (nreps * 5) div 100"),
          col("rep_mean_milli"))).as("boot_hi_milli"))
    else
      ranked.groupBy(col("event_type")).agg(
        max(when(col("rk") === 2, col("rep_mean_milli"))).as("boot_lo_milli"),
        max(when(col("rk") === Q224Reps - 1, col("rep_mean_milli"))).as("boot_hi_milli"))
    val full = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), expr("1000 * sum(cents) div count(*)").as("mean_milli"))
    full.join(ci, "event_type")
      .select(col("event_type"), col("n"), col("mean_milli"),
        col("boot_lo_milli"), col("boot_hi_milli"),
        (col("mean_milli") >= col("boot_lo_milli") &&
          col("mean_milli") <= col("boot_hi_milli")).as("covered"))
      .orderBy(col("event_type"))
  }

  /** r9 body of q224 (pre-507649a), verbatim, for perf bisection. */
  def q224r9(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.queries.Curation.{Q224Reps, Q224PoissonCdf}
    val h60 = graft.functions.ColFns.h60 _
    val cdfCase = Q224PoissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 7L END")
    val e = graft.Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val drawn = e
      .withColumn("b", explode(array((0 until Q224Reps).map(lit(_)): _*)))
      .withColumn("u", (h60(concat_ws(":", lit("boot"), col("b"), col("event_id"))) /
        lit(1152921504606846976.0)))
      .withColumn("w", expr(cdfCase))
    val reps = drawn.groupBy(col("event_type"), col("b"))
      .agg(sum(col("w")).as("wn"), sum(col("w") * col("cents")).as("wsum"))
      .withColumn("rep_mean_milli", expr("1000 * wsum div wn"))
    val wRk = Window.partitionBy(col("event_type"))
      .orderBy(col("rep_mean_milli"), col("b"))
    val ci = reps.withColumn("rk", row_number().over(wRk))
      .groupBy(col("event_type"))
      .agg(max(when(col("rk") === 2, col("rep_mean_milli"))).as("boot_lo_milli"),
        max(when(col("rk") === Q224Reps - 1, col("rep_mean_milli"))).as("boot_hi_milli"))
    val full = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), expr("1000 * sum(cents) div count(*)").as("mean_milli"))
    full.join(ci, "event_type")
      .select(col("event_type"), col("n"), col("mean_milli"),
        col("boot_lo_milli"), col("boot_hi_milli"),
        (col("mean_milli") >= col("boot_lo_milli") &&
          col("mean_milli") <= col("boot_hi_milli")).as("covered"))
      .orderBy(col("event_type"))
  }
}
