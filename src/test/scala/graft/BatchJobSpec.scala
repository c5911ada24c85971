package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.Parsers.{CsvSpec, FwField, FwSpec}

/** End-to-end `processFile` — the reference's public API restated — on real
  * files with all three sinks.
  */
class BatchJobSpec extends SparkTestBase {

  test("processFile: CSV job writes target, status and run tables; counts match") {
    val dir = Files.createTempDirectory("graft-job")
    val in = dir.resolve("batch.csv")
    Files.write(in, (1 to 50).map { i =>
      if (i % 10 == 0) s"k$i,notanum" else s"k$i,$i.5"
    }.mkString("\n").getBytes)
    val sinks = BatchJob.Sinks(
      targetPath = Some(dir.resolve("target").toString),
      statusPath = Some(dir.resolve("status").toString),
      runPath = Some(dir.resolve("runs").toString))

    var started = false; var ended = false
    val summary = BatchJob.processFile(
      spark, in.toString,
      BatchJob.Parser.Csv(CsvSpec(Vector("key", "amount"), Some(Vector("string", "number")))),
      sinks,
      hooks = graft.ingest.BatchPipeline.Hooks(
        onStart = () => started = true, onEnd = () => ended = true))

    assert(started && ended)
    assert(summary.totalRecordCount == 50)
    assert(summary.successCount == 45)
    assert(summary.failureCount == 5)
    assert(summary.ignoredCount == 0)

    val target = spark.read.parquet(sinks.targetPath.get)
    assert(target.count() == 45)
    assert(target.columns.toSet == Set("_file", "_rec_id", "key", "amount", "run_id"))
    val status = spark.read.parquet(sinks.statusPath.get)
    assert(status.count() == 50)
    assert(status.filter(col("status_text") === "FAILED").count() == 5)
    // run row is version-threaded: insert at v1 (PROCESSING), stats update
    // at v2 (COMPLETED) — the reference's POST-then-PUT-with-_version flow
    val store = new graft.ingest.BatchRunStore(spark, sinks.runPath.get)
    val run = store.current(summary.runId).get
    assert(run.successCount == 45)
    assert(run.version == 2 && run.status == "COMPLETED")
    assert(spark.read.parquet(sinks.runPath.get).count() == 2) // full audit history retained
    // optimistic lock: an update presenting the stale version is rejected
    assertThrows[java.util.ConcurrentModificationException] {
      store.update(summary.runId, expectedVersion = 1L)(identity)
    }
    // ...and presenting the current version succeeds and bumps it
    assert(store.update(summary.runId, expectedVersion = 2L)(_.copy(status = "FAILED")) == 3L)
    assert(store.current(summary.runId).get.status == "FAILED")
  }

  test("processFile: custom parser with ignores, append across two runs") {
    val dir = Files.createTempDirectory("graft-job2")
    val in = dir.resolve("batch.txt")
    Files.write(in, "a\nskip\nb\nskip\nc".getBytes)
    val sinks = BatchJob.Sinks(statusPath = Some(dir.resolve("status").toString))
    val parser = BatchJob.Parser.Custom(Seq("v"), Seq("string"), rd =>
      if (rd.rec == "skip") (None, None) else (Some(Seq(rd.rec.toUpperCase)), None))

    val s1 = BatchJob.processFile(spark, in.toString, parser, sinks)
    assert(s1.totalRecordCount == 3 && s1.ignoredCount == 2)
    val s2 = BatchJob.processFile(spark, in.toString, parser, sinks)
    // append-mode audit: two runs, distinct runIds, 3 non-ignored rows each
    val status = spark.read.parquet(sinks.statusPath.get)
    assert(status.count() == 6)
    assert(status.select("run_id").distinct().count() == 2)
    assert(s1.runId != s2.runId)
  }

  test("processFile: fixed-width job with record-length failures") {
    val dir = Files.createTempDirectory("graft-job3")
    val in = dir.resolve("batch.fwv")
    Files.write(in, "001ab\n002cd\nbadline\n003ef".getBytes)
    val spec = FwSpec(Vector(FwField("id", "number", 1, 3), FwField("v", "string", 4, 5)))
    val summary = BatchJob.processFile(spark, in.toString, BatchJob.Parser.Fw(spec))
    assert(summary.successCount == 3)
    assert(summary.failureCount == 1)
  }

  test("processFile: JDBC sink writes target rows to an embedded SQL database") {
    // gated on driver presence: Derby ships with the Spark distribution
    // here; any other backend (Postgres/Oracle — the reference's matrix)
    // is the same channel with a different url/driver property
    val hasDerby =
      try { Class.forName("org.apache.derby.jdbc.EmbeddedDriver"); true }
      catch { case _: ClassNotFoundException => false }
    assume(hasDerby, "no embedded JDBC driver on classpath")
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val dir = Files.createTempDirectory("graft-jdbc")
    val in = dir.resolve("batch.csv")
    Files.write(in, (1 to 20).map(i => s"k$i,$i.5").mkString("\n").getBytes)
    val url = s"jdbc:derby:$dir/db;create=true"
    val summary = BatchJob.processFile(
      spark, in.toString,
      BatchJob.Parser.Csv(CsvSpec(Vector("key", "amount"), Some(Vector("string", "number")))),
      BatchJob.Sinks(jdbc = Some(BatchJob.JdbcSink(url, "batch_target"))))
    assert(summary.successCount == 20)
    val props = new java.util.Properties()
    val back = spark.read.jdbc(url, "batch_target", props)
    assert(back.count() == 20)
    assert(back.columns.toSet == Set("_file", "_rec_id", "key", "amount", "run_id"))
    assert(back.agg(sum(col("amount"))).collect().head.getDouble(0) == (1 to 20).map(_ + 0.5).sum)
    // append semantics across runs, like the parquet sinks
    BatchJob.processFile(spark, in.toString,
      BatchJob.Parser.Csv(CsvSpec(Vector("key", "amount"), Some(Vector("string", "number")))),
      BatchJob.Sinks(jdbc = Some(BatchJob.JdbcSink(url, "batch_target"))))
    assert(spark.read.jdbc(url, "batch_target", props).count() == 40)
  }

  test("processFile: config errors are job-fatal before any task (reference contract)") {
    assertThrows[IllegalArgumentException] {
      BatchJob.processFile(spark, "/nonexistent",
        BatchJob.Parser.Csv(CsvSpec(Vector.empty)))
    }
  }
}
