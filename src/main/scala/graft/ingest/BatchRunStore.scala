package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One BatchRun record at one `_version` — the reference's run-row shape
  * (`common/models/batch-run.json:7-19`) plus the optimistic-lock version
  * its REST backend threads through every write
  * (`lib/batchProcessing.js:288,548,573`).
  */
final case class BatchRunRow(
    runId: String,
    filePath: String,
    status: String, // PROCESSING | COMPLETED | FAILED
    totalRecordCount: Long,
    successCount: Long,
    failureCount: Long,
    ignoredCount: Long,
    startTimeMillis: Long,
    endTimeMillis: Long,
    durationMillis: Long,
    error: Option[String],
    version: Long)

/** BatchRun lifecycle store with the reference's `_version` optimistic-lock
  * threading: `insert` creates the run at version 1 (the reference's POST,
  * which returns `_version` — `lib/batchProcessing.js:288`); `update` must
  * present the CURRENT version (the reference's PUT body carries `_version`
  * — `:548`) and bumps it, so a writer holding a stale version fails
  * instead of silently clobbering a concurrent update.
  *
  * Storage is an append-only parquet log — the cluster-friendly shape: rows
  * are immutable appends, the current state of a run is its max-version row
  * ([[BatchRunStore.current]]), and history is retained for audit. The
  * version CHECK is compare-and-append against the read view; on a real
  * deployment the run row lives in a transactional store and the check is a
  * conditional write — the API contract (present current version or fail)
  * is identical.
  */
final class BatchRunStore(spark: SparkSession, path: String) {
  import spark.implicits._

  /** Reference fatal text when a run row comes back versionless
    * (`lib/batchProcessing.js:291-293`).
    */
  private val NoVersionMsg = "could not get batchRun version"

  private def readAll(): Dataset[BatchRunRow] =
    if (new java.io.File(path).exists())
      spark.read.parquet(path).as[BatchRunRow]
    else spark.emptyDataset[BatchRunRow]

  /** Current state of a run: its highest-version row. */
  def current(runId: String): Option[BatchRunRow] =
    readAll().filter(col("runId") === runId)
      .orderBy(col("version").desc).limit(1)
      .collect().headOption

  /** All runs' current states (one row per runId, max version). */
  def currentAll(): Dataset[BatchRunRow] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("runId")).orderBy(col("version").desc)
    readAll().withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk").as[BatchRunRow]
  }

  /** Create the run row (status PROCESSING, zero counters) and return its
    * initial version — the reference's POST-then-read-`_version` handshake.
    */
  def insert(runId: String, filePath: String, startTimeMillis: Long): Long = {
    val row = BatchRunRow(runId, filePath, "PROCESSING",
      0L, 0L, 0L, 0L, startTimeMillis, 0L, 0L, None, version = 1L)
    Seq(row).toDS().write.mode("append").parquet(path)
    1L
  }

  /** Read-modify-write with version check: `expectedVersion` must equal the
    * run's current version or the update is rejected (the optimistic-lock
    * contract of the reference's PUT-with-`_version`). Returns the new
    * version.
    */
  def update(runId: String, expectedVersion: Long)(f: BatchRunRow => BatchRunRow): Long = synchronized {
    // `synchronized` makes check-then-append atomic within this JVM (the
    // harness's single-driver reality). Cross-process writers aren't
    // serialized by it, so after the append we re-read and fail LOUDLY if
    // two writers landed rows at the same bumped version — a detected
    // conflict must surface, not resolve to an arbitrary winner.
    val cur = current(runId).getOrElse(throw new IllegalStateException(NoVersionMsg))
    if (cur.version != expectedVersion)
      throw new java.util.ConcurrentModificationException(
        s"BatchRun $runId version conflict: expected $expectedVersion, " +
          s"found ${cur.version} — run row was updated concurrently")
    val next = f(cur).copy(runId = runId, version = expectedVersion + 1)
    Seq(next).toDS().write.mode("append").parquet(path)
    val dup = readAll()
      .filter(col("runId") === runId && col("version") === next.version)
      .count()
    if (dup > 1)
      throw new java.util.ConcurrentModificationException(
        s"BatchRun $runId version conflict: $dup writers appended version " +
          s"${next.version} — store requires a transactional backend for " +
          "multi-process writers")
    next.version
  }
}
