package graft

import org.apache.spark.sql.functions._

import graft.ingest.BatchPipeline._
import graft.ingest.Parsers._

/** Replays the reference's own test fixtures (read-only at /root/reference)
  * through the fidelity pipeline — the routing/count semantics its E2E suite
  * asserts (`test/test.js:255-262,415-431,936-953`), checked on the real
  * bytes.
  */
class FixtureReplaySpec extends SparkTestBase {

  private val ref = "/root/reference/test"

  test("batch-100.csv: quote-aware CSV with embedded commas, 100 SUCCESS") {
    val ds = textSource(spark, s"$ref/batch-100.csv")
    val spec = CsvSpec(headers = Vector("key", "value")) // all-string default
    val routed = route(parseCsv(ds, spec))
    assert(routed.count() == 100)
    assert(successes(routed).count() == 100)
    val first = routed.orderBy("_rec_id").collect().head
    assert(first.getAs[String]("key") == "B0001")
    assert(first.getAs[String]("value") == "C00,0001", "quoted comma must survive")
  }

  test("fwbatch-100.fwv: fixed-width positions 1-5/6-13, 100 SUCCESS") {
    val ds = textSource(spark, s"$ref/fwbatch-100.fwv")
    val spec = FwSpec(Vector(
      FwField("key", "string", 1, 5),
      FwField("value", "string", 6, 13)))
    val routed = route(parseFw(ds, spec))
    assert(successes(routed).count() == 100)
    val first = routed.orderBy("_rec_id").collect().head
    assert(first.getAs[String]("key") == "B0001")
    assert(first.getAs[String]("value") == "C00,0001")
  }

  test("batch-100.txt: 79-char lines as FW number fields (test/test.js:936-953)") {
    val ds = textSource(spark, s"$ref/batch-100.txt")
    val spec = FwSpec(Vector(
      FwField("key", "number", 1, 39),
      FwField("value", "number", 41, 79)))
    val routed = route(parseFw(ds, spec))
    val n = routed.count()
    assert(n >= 99, s"fixture has ~100 lines, got $n")
    assert(failures(routed).count() == 0)
    // 39-digit decimal strings coerce via JS Number() to 1e38
    val first = routed.orderBy("_rec_id").collect().head
    assert(math.abs(first.getAs[Double]("key") - 1e38) / 1e38 < 1e-9)
  }

  test("batch-100.csv through the full runCsvJob slice reproduces the summary shape") {
    val ds = textSource(spark, s"$ref/batch-100.csv")
    val spec = CsvSpec(headers = Vector("key", "value"))
    val (_, status, summary) = runCsvJob(spark, ds, spec)
    val s = summary.collect().head
    assert(s.getAs[Long]("totalRecordCount") == 100L)
    assert(s.getAs[Long]("successCount") == 100L)
    assert(s.getAs[Long]("failureCount") == 0L)
    assert(status.count() == 100)
  }
}
