package graft

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.BatchPipeline._
import graft.ingest.Parsers.{CsvSpec, FwSpec}
import graft.ingest.{BatchConfig, RecData}

/** The reference's one public API, re-expressed:
  * `processFile(filePath, options, jobService, cb)`
  * (`lib/batchProcessing.js:130`, exported at `:735`) becomes a synchronous
  * call returning the run summary, with the same observable outputs — target
  * records, per-record BatchStatus rows, one BatchRun row — written as
  * columnar tables instead of per-record REST calls.
  *
  * Correspondence:
  *   - `jobService.onEachRecord`  -> [[Parser.Custom]]
  *   - built-in csv/fw parsers    -> [[Parser.Csv]] / [[Parser.Fw]]
  *   - `jobService.onStart/onEnd` -> [[graft.ingest.BatchPipeline.Hooks]]
  *   - `options` + env precedence -> [[graft.ingest.BatchConfig]]
  *   - fatal-vs-record errors     -> config errors throw here (driver-side,
  *     before any task runs); data errors land in BatchStatus and never
  *     abort the run (`README.md:100-101` contract)
  */
object BatchJob {

  sealed trait Parser
  object Parser {
    final case class Csv(spec: CsvSpec) extends Parser
    final case class Fw(spec: FwSpec) extends Parser
    final case class Custom(names: Seq[String], types: Seq[String],
        fn: RecData => (Option[Seq[Any]], Option[String])) extends Parser
  }

  /** The BatchRun row (`common/models/batch-run.json:7-19`). */
  final case class RunSummary(
      runId: String,
      filePath: String,
      totalRecordCount: Long,
      successCount: Long,
      failureCount: Long,
      ignoredCount: Long,
      startTimeMillis: Long,
      endTimeMillis: Long,
      durationMillis: Long)

  /** External-database target channel — the reference is tested against a
    * memory/Mongo/Postgres/Oracle backend matrix
    * (`test/datasources.mongo.js:19-28`, `test/datasources.postgres.js`,
    * `test/datasources.oracle.js`); Spark's built-in `jdbc` format is the
    * equivalent: any backend with a JDBC driver jar on the executor
    * classpath plugs in via `url` + `properties` (driver class, creds),
    * no engine change. Writes shard per-partition (one connection per
    * task), the at-scale shape for bulk DB loads.
    */
  final case class JdbcSink(
      url: String,
      table: String,
      properties: Map[String, String] = Map.empty)

  final case class Sinks(
      targetPath: Option[String] = None, // parsed SUCCESS records
      statusPath: Option[String] = None, // per-record BatchStatus audit
      runPath: Option[String] = None,    // one-row BatchRun summary
      rest: Option[graft.ingest.RestSink.RestOptions] = None, // P11 per-record REST channel
      jdbc: Option[JdbcSink] = None)     // external-DB target channel

  /** Fold per-record HTTP outcomes into BatchStatus rows: the REST
    * channel's code/text/error win over the parse-stage values, exactly
    * like the reference counts `statusCode === 200` per record
    * (`lib/batchProcessing.js:679,700`). Shared by the batch path and the
    * streaming foreachBatch path so batch runs oracle the stream.
    */
  def statusWithHttp(base: DataFrame, restResults: Option[DataFrame]): DataFrame =
    restResults.fold(base) { r =>
      base.join(
          r.select(col("rec_id"),
            col("status_code").cast("int").as("http_code"),
            col("status_text").as("http_status"), col("error").as("http_error")),
          Seq("rec_id"), "left")
        .select(col("file_name"), col("rec_id"),
          coalesce(col("http_status"), col("status_text")).as("status_text"),
          coalesce(col("http_code"), col("status_code")).as("status_code"),
          coalesce(col("http_error"), col("error")).as("error"))
    }

  /** Process one line-delimited file end-to-end. */
  def processFile(
      spark: SparkSession,
      filePath: String,
      parser: Parser,
      sinks: Sinks = Sinks(),
      config: BatchConfig = BatchConfig.load(),
      hooks: Hooks = Hooks()): RunSummary = {

    // the reference's pre-flight sanity gate, same fatal texts in the same
    // order (lib/batchProcessing.js:154-166); the file-existence check
    // throws Node's ENOENT phrasing (test/test.js expects the substring
    // 'no such file or directory') from the driver before any job launches
    if (filePath == null || filePath.trim.isEmpty)
      throw new IllegalArgumentException("filePath is not specified. Aborting processing.")
    if (parser == null)
      throw new IllegalArgumentException("jobService is not specified. Aborting processing.")
    parser match {
      case Parser.Custom(_, _, fn) if fn == null =>
        throw new IllegalArgumentException(
          "jobService.onEachRecord() is not defined. Aborting processing.")
      case _ =>
    }
    if (!filePath.exists(c => c == '*' || c == '?' || c == '[') &&
      !new java.io.File(filePath).exists())
      throw new java.io.FileNotFoundException(
        s"ENOENT: no such file or directory, open '$filePath'")

    val runId = UUID.randomUUID().toString
    val start = System.currentTimeMillis()
    hooks.onStart()

    // BatchRun lifecycle with the reference's optimistic-lock `_version`
    // threading (lib/batchProcessing.js:288,548): insert the PROCESSING row
    // first and hold its version; the end-of-run stats update must present
    // it, so a concurrent writer with a stale version fails loudly.
    val runStore = sinks.runPath.map(p => new graft.ingest.BatchRunStore(spark, p))
    val runVersion = runStore.map(_.insert(runId, filePath, start))

    // The try opens IMMEDIATELY after the run-row insert: a missing input
    // file or an AnalysisException thrown while CONSTRUCTING the pipeline
    // (textSource/parse/route) must also finalize the run as FAILED, not
    // leave it stuck at PROCESSING v1. The persisted frames are tracked in
    // vars so the finally can unpersist whichever ones exist.
    var routed: DataFrame = null
    var restResults: Option[DataFrame] = None
    try {
      val lines = textSource(spark, filePath)
      val parsed: DataFrame = parser match {
        case Parser.Csv(spec) => parseCsv(lines, spec)
        case Parser.Fw(spec)  => parseFw(lines, spec)
        case Parser.Custom(names, types, fn) => parseCustom(lines, names, types)(fn)
      }
      routed = route(parsed)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // The REST channel (P11): POST each SUCCESS-parsed record's JSON; its
      // per-record HTTP outcome then drives the status rows and run counters,
      // exactly like the reference counts `statusCode === 200`
      // (lib/batchProcessing.js:679,700). Persisted because both the status
      // sink and the counters consume it — recomputing would re-send.
      restResults = sinks.rest.map { ro =>
        val dataCols = parsed.columns
          .filterNot(Set("_file", "_rec_id", "_error").contains).map(col)
        graft.ingest.RestSink
          .send(successes(routed), col("_rec_id"), to_json(struct(dataCols.toIndexedSeq: _*)), ro)
          .toDF()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      sinks.targetPath.foreach { p =>
        successes(routed).drop("_error", "statusText")
          .withColumn("run_id", lit(runId))
          .write.mode("append").parquet(p)
      }
      sinks.jdbc.foreach { j =>
        val props = new java.util.Properties()
        j.properties.foreach { case (k, v) => props.setProperty(k, v) }
        successes(routed).drop("_error", "statusText")
          .withColumn("run_id", lit(runId))
          .write.mode("append").jdbc(j.url, j.table, props)
      }
      sinks.statusPath.foreach { p =>
        statusWithHttp(batchStatus(routed, config.batchResultLogItems), restResults)
          .withColumn("run_id", lit(runId)).write.mode("append").parquet(p)
      }
      val counts = routed.groupBy(col("statusText")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val parsedOk = counts.getOrElse("SUCCESS", 0L)
      val httpOk = restResults.map(_.filter(col("status_code") === 200).count())
      val end = System.currentTimeMillis()
      val summary = RunSummary(
        runId, filePath,
        totalRecordCount = parsedOk + counts.getOrElse("FAILED", 0L),
        successCount = httpOk.getOrElse(parsedOk),
        failureCount = counts.getOrElse("FAILED", 0L) + httpOk.map(parsedOk - _).getOrElse(0L),
        ignoredCount = counts.getOrElse("IGNORED", 0L),
        startTimeMillis = start, endTimeMillis = end, durationMillis = end - start)
      runStore.foreach { st =>
        st.update(runId, runVersion.get) { row =>
          row.copy(status = "COMPLETED",
            totalRecordCount = summary.totalRecordCount,
            successCount = summary.successCount,
            failureCount = summary.failureCount,
            ignoredCount = summary.ignoredCount,
            endTimeMillis = end, durationMillis = end - start)
        }
      }
      hooks.onEnd()
      summary
    } catch {
      // The reference finalizes the run row EVEN on failure — its end-of-job
      // PUT always fires and carries the error text
      // (lib/batchProcessing.js:548). Mirror that: mark FAILED with the
      // error before rethrowing, so a crashed job never leaves the run
      // stuck at PROCESSING v1. The status write itself is best-effort —
      // the original failure is what propagates.
      case e: Throwable =>
        val end = System.currentTimeMillis()
        runStore.foreach { st =>
          try st.update(runId, runVersion.get) { row =>
            row.copy(status = "FAILED",
              error = Some(Option(e.getMessage).getOrElse(e.getClass.getName)),
              endTimeMillis = end, durationMillis = end - start)
          } catch { case _: Throwable => () }
        }
        throw e
    } finally {
      // guard: a construction-phase failure may leave either frame unbuilt
      restResults.foreach(_.unpersist())
      if (routed != null) routed.unpersist()
    }
  }
}
