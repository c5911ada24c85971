package graft

/** Plan-capture harness (optimization rounds): for each named query, build
  * the DataFrame exactly as Bench does (same session shape, same untimed
  * fixture hoists, same top-k rewrite) and write `.explain("formatted")`
  * to `<outDir>/<name>.txt`. No query is executed — this captures the
  * pre-AQE physical plan (Exchange count, join strategy, PushedFilters,
  * ReadSchema), the artifact the judge checks optimization claims against.
  *
  *   sbt 'runMain graft.Explain /root/testdata/sf0.1 plans/r18/before q262,q258'
  *
  * Third arg is the SPARK_GRAFT_ONLY-style prefix filter (comma list);
  * omitted = every registered query.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    // the ONE session builder Bench uses — same confs, same cpus default —
    // so the captured plans are the benched plans (r18 ADVICE: the two
    // builders had drifted on the SPARK_GRAFT_CPUS default, 32 vs 4)
    val spark = HarnessSession.build()
    val keep: String => Boolean =
      name => only.forall(_.exists(name.startsWith))
    val kept = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => keep(name) }
    // same untimed ingest hoists as Bench, so the plans are the benched ones
    if (kept.exists { case (n, _) =>
        graft.queries.Dedup.candidateConsumers.exists(n.startsWith) })
      graft.queries.Dedup.writeSignatureStore(spark, sfDir)
    if (kept.exists { case (n, _) =>
        graft.queries.CorpusOps.lexConsumers.exists(n.startsWith) })
      graft.queries.CorpusOps.writeLexStore(spark, sfDir)
    kept.foreach { case (n, _) =>
      graft.queries.IngestOps.warmFixture(spark, sfDir, n.takeWhile(_ != '_'))
    }
    new java.io.File(outDir).mkdirs()
    // NonFatal only (an OOM must crash, not masquerade as a skipped query),
    // and a nonzero exit when ANY query fails — a run where every explain
    // failed must not look like success to CI/scripting (r18 ADVICE)
    var failures = 0
    kept.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val out = new java.io.PrintWriter(s"$outDir/$name.txt")
        try out.println(txt) finally out.close()
        println(s"[explain] wrote $outDir/$name.txt")
      } catch { case scala.util.control.NonFatal(e) =>
        failures += 1
        System.err.println(s"[explain] $name failed: ${e.toString.take(300)}")
      }
    }
    spark.stop()
    if (failures > 0) {
      System.err.println(s"[explain] $failures quer(ies) failed to plan")
      sys.exit(1)
    }
  }
}
