package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Structured Streaming: the streaming hourly aggregation over a file source
  * must converge to the same result as the batch aggregation — batch is the
  * oracle for the stream.
  */
class StreamingSpec extends SparkTestBase {

  test("streaming hourly agg converges to the batch result") {
    val tmp = Files.createTempDirectory("graft-stream")
    val inDir = tmp.resolve("in").toString
    val outDir = tmp.resolve("out").toString
    val ckDir = tmp.resolve("ck").toString

    // stage the events table as the file-source input (ts already micros)
    val events = Tables(spark, sfDir, "events")
    events.repartition(4).write.parquet(inDir)

    val stream = EventStream.readEventStream(spark, inDir, maxFilesPerTrigger = 2)
    val q = EventStream.startParquetSink(EventStream.hourlyAgg(stream), outDir, ckDir)
    q.processAllAvailable()
    q.stop()

    // append mode emits a window only after the watermark passes its end, so
    // the emitted set is a prefix of the batch result — but every emitted
    // row must carry exactly the batch-computed count
    val got = spark.read.parquet(outDir)
      .select(col("hour_start").cast("long").as("h"), col("event_type"), col("n_events"))
      .collect().map(_.toSeq).toSet
    val batchAll = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("long").as("h"), col("event_type"), col("n_events"))
      .collect().map(_.toSeq).toSet

    assert(got.nonEmpty, "stream must emit at least the early closed windows")
    assert(got.subsetOf(batchAll), "every emitted window must equal its batch count")
  }

  test("streaming CSV ingest routes records exactly like the batch parser") {
    import graft.ingest.Parsers.CsvSpec
    val tmp = Files.createTempDirectory("graft-ingest")
    val inDir = tmp.resolve("in"); Files.createDirectory(inDir)
    val outDir = tmp.resolve("out").toString
    val ckDir = tmp.resolve("ck").toString
    Files.write(inDir.resolve("a.csv"), "k1,10\nk2,bad\nk3,30\n".getBytes)
    Files.write(inDir.resolve("b.csv"), "k4,40\nk5,oops\n".getBytes)

    val spec = CsvSpec(Vector("key", "amount"), Some(Vector("string", "number")))
    val routed = EventStream.csvIngestStream(spark, inDir.toString, spec, maxFilesPerTrigger = 1)
    val q = EventStream.startParquetSink(
      routed.select("key", "amount", "statusText"), outDir, ckDir)
    q.processAllAvailable()
    q.stop()

    val rows = spark.read.parquet(outDir).collect()
    assert(rows.length == 5)
    val byKey = rows.map(r => r.getAs[String]("key") -> r.getAs[String]("statusText")).toMap
    assert(byKey == Map("k1" -> "SUCCESS", "k2" -> "FAILED", "k3" -> "SUCCESS",
      "k4" -> "SUCCESS", "k5" -> "FAILED"))
  }

  test("flatMapGroupsWithState session rows agree with window-based session counts") {
    import graft.queries.EventsOps
    val events = Tables(spark, sfDir, "events")
    val rows = EventStream.sessionRows(spark, events).collect()
    // per-user session count and event totals must match the SQL-window path
    val byUser = rows.groupBy(_.getAs[Long]("userId"))
      .map { case (u, rs) => (u, rs.length.toLong, rs.map(_.getAs[Long]("nEvents")).sum) }
      .toSet
    val batch = EventsOps.q22Sessionize(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))
      .toSet
    assert(byUser == batch)
    // sessions are well-formed: start <= end, events >= 1, no overlaps per user
    rows.groupBy(_.getAs[Long]("userId")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("startUs"))
      sorted.foreach(r => assert(r.getAs[Long]("startUs") <= r.getAs[Long]("endUs")))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Long]("endUs") < b.getAs[Long]("startUs"))
        case _ =>
      }
    }
  }

  test("stateful sessionization matches the batch sessionize counts") {
    import graft.queries.EventsOps
    val events = Tables(spark, sfDir, "events")
    val streamed = EventStream.sessionize(spark, events)
      .collect().map(r => (r.getAs[Long]("userId"), r.getAs[Long]("nSessions"), r.getAs[Long]("nEvents"))).toSet
    val batch = EventsOps.q22Sessionize(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toSet
    assert(streamed == batch)
  }
}
