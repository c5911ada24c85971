package graft.ingest

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** P17 — progress reporting (`lib/batchProcessing.js:299-311`): the
  * reference prints processed/succeeded/failed counts every
  * `progressInterval` ms from driver-side counters.
  *
  * At scale per-record driver callbacks are impossible; the Spark-native
  * equivalent is a SparkListener aggregating task metrics — records and
  * bytes flow in from every executor's task-end events with no impact on
  * the job's data path.
  */
final class ProgressReporter(progressIntervalMillis: Int = 10000,
                             onReport: ProgressReporter.Snapshot => Unit = ProgressReporter.printReport)
    extends SparkListener {

  private val recordsRead = new LongAdder
  private val bytesRead = new LongAdder
  private val recordsWritten = new LongAdder
  private val tasksCompleted = new LongAdder
  @volatile private var lastReport = System.currentTimeMillis()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      recordsRead.add(m.inputMetrics.recordsRead)
      bytesRead.add(m.inputMetrics.bytesRead)
      recordsWritten.add(m.outputMetrics.recordsWritten)
      tasksCompleted.increment()
    }
    val now = System.currentTimeMillis()
    if (progressIntervalMillis > 0 && now - lastReport >= progressIntervalMillis) {
      lastReport = now
      onReport(snapshot)
    }
  }

  def snapshot: ProgressReporter.Snapshot = ProgressReporter.Snapshot(
    recordsRead.sum(), bytesRead.sum(), recordsWritten.sum(), tasksCompleted.sum())

  /** Attach to a session; returns a detach handle. */
  def attach(spark: SparkSession): () => Unit = {
    spark.sparkContext.addSparkListener(this)
    () => spark.sparkContext.removeSparkListener(this)
  }
}

object ProgressReporter {
  final case class Snapshot(recordsRead: Long, bytesRead: Long, recordsWritten: Long, tasksCompleted: Long)

  def printReport(s: Snapshot): Unit =
    // stdout cadence mirrors the reference's progress line
    println(s"[progress] read=${s.recordsRead} rows (${s.bytesRead} B) " +
      s"written=${s.recordsWritten} rows tasks=${s.tasksCompleted}")
}
