package graft.sources

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MINIMAL DELTA-PROTOCOL TRANSACTION LOG — reader and writer for the
  * PUBLIC Delta Lake log format (the delta-io PROTOCOL.md wire format),
  * with no foreign jar: the `WireBus` move applied to table formats. A
  * Delta table is parquet data files plus `_delta_log/`:
  *
  *   - `%020d.json` — one commit per version: newline-delimited JSON
  *     actions (`protocol`, `metaData`, `add {path, size, ...}`,
  *     `remove {path, ...}`, `commitInfo`);
  *   - `%020d.checkpoint.parquet` — the live action set compacted at a
  *     version, so replay is bounded by checkpoint cadence, not table
  *     lifetime;
  *   - `_last_checkpoint` — JSON pointer `{"version": N}` to the newest
  *     checkpoint.
  *
  * The snapshot at version v is the adds of commits 0..v minus the
  * removes (last action per path wins) — identical replay semantics to
  * [[graft.table.VersionedTable]]'s native manifest log, which is what
  * makes the two interoperable: INBOUND, `read(root, v)` materializes a
  * snapshot another engine committed and `VersionedTable.init` adopts it
  * (q241 runs that exact loop against a table written by [[commitAppend]]
  * / [[commitReplace]]); OUTBOUND, the writer publishes commits any Delta
  * reader accepts, with the same atomic put-if-absent race on the commit
  * file that object-store Delta writers use.
  *
  * Scale: log replay is driver-side string work sized by versions since
  * the last checkpoint (never data-sized); the checkpoint read is one
  * tiny parquet. Data files are never listed from storage — the log IS
  * the listing, the property that makes Delta-shaped tables usable on
  * object stores at 100 TB.
  */
object DeltaLog {

  private def logDir(root: String): Path = Paths.get(root, "_delta_log")
  private def commitPath(root: String, v: Long): Path =
    logDir(root).resolve(f"$v%020d.json")
  private def checkpointPath(root: String, v: Long): Path =
    logDir(root).resolve(f"$v%020d.checkpoint.parquet")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def listVersions(root: String, suffix: String): Seq[Long] =
    if (!Files.isDirectory(logDir(root))) Seq.empty
    else {
      val s = Files.list(logDir(root))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(suffix) && n.length > suffix.length &&
          n.dropRight(suffix.length).forall(_.isDigit))
        .map(_.dropRight(suffix.length).toLong).toSeq
      finally s.close()
    }

  /** Highest committed version, -1 if the table does not exist. */
  def currentVersion(root: String): Long = {
    val vs = listVersions(root, ".json")
    if (vs.isEmpty) -1L else vs.max
  }

  /** Live data-file paths (relative to `root`) at `version` (default:
    * latest): replay from the newest checkpoint at or below the version,
    * then the JSON commit tail. Order is first-add order, stable across
    * replays.
    */
  def snapshotFiles(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[String] = {
    val cur = currentVersion(root)
    require(cur >= 0, s"no Delta log at $root")
    val v = version.getOrElse(cur)
    require(v >= 0 && v <= cur, s"version $v out of range [0, $cur]")
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Unit]
    val ckpt = listVersions(root, ".checkpoint.parquet").filter(_ <= v)
      .sorted.lastOption
    ckpt.foreach { c =>
      spark.read.parquet(checkpointPath(root, c).toString)
        .select(col("add.path"))
        .filter(col("path").isNotNull)
        .collect().foreach(r => live(r.getString(0)) = ())
    }
    (ckpt.getOrElse(-1L) + 1L to v).foreach { i =>
      Files.readAllLines(commitPath(root, i)).forEach { line =>
        if (line.nonEmpty) {
          val node = mapper.readTree(line)
          if (node.has("add")) live(node.get("add").get("path").asText()) = ()
          else if (node.has("remove"))
            live.remove(node.get("remove").get("path").asText())
        }
      }
    }
    live.keys.toSeq
  }

  /** The snapshot exactly as `version` committed it — Delta time travel. */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val paths = snapshotFiles(spark, root, version).map(p => s"$root/$p")
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
  }

  private def jstr(s: String): String = mapper.writeValueAsString(s)

  /** Publish commit `v` atomically (put-if-absent on the commit file —
    * the same single-winner race Delta writers run on object stores).
    */
  private def publish(root: String, v: Long, actions: Seq[String]): Unit = {
    Files.createDirectories(logDir(root))
    try
      Files.write(commitPath(root, v),
        actions.mkString("", "\n", "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"DeltaLog $root: version $v was committed concurrently")
    }
  }

  /** Write `df`'s rows as parquet under a commit-unique subdirectory and
    * return (relativePath, size) per data file.
    */
  private def writeDataFiles(root: String, v: Long,
      df: DataFrame): Seq[(String, Long)] = {
    val sub = f"c$v%05d-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"$root/$sub")
    val d = new java.io.File(s"$root/$sub")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .map(f => (s"$sub/${f.getName}", f.length()))
      .toIndexedSeq
  }

  private def addAction(path: String, size: Long): String =
    s"""{"add":{"path":${jstr(path)},"partitionValues":{},"size":$size,""" +
      s""""modificationTime":0,"dataChange":true}}"""

  private def removeAction(path: String): String =
    s"""{"remove":{"path":${jstr(path)},"deletionTimestamp":0,"dataChange":true}}"""

  private def headerActions(df: DataFrame): Seq[String] = Seq(
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
    s"""{"metaData":{"id":${jstr(java.util.UUID.randomUUID().toString)},""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(df.schema.json)},""" +
      """"partitionColumns":[],"configuration":{}}}""")

  /** Append `df` as the next commit (commit 0 creates the table and
    * carries the protocol/metaData actions). `expectedVersion` is the
    * optimistic-concurrency seam every Delta writer runs: pass the
    * version the work was based on and the commit lands at exactly
    * `expectedVersion + 1` or throws ConcurrentModificationException if
    * another writer got there first; None means "latest right now".
    * Returns the committed version.
    */
  def commitAppend(root: String, df: DataFrame,
      expectedVersion: Option[Long] = None): Long = {
    val next = expectedVersion.getOrElse(currentVersion(root)) + 1
    val adds = writeDataFiles(root, next, df)
    val header = if (next == 0L) headerActions(df) else Seq.empty
    publish(root, next,
      header ++ adds.map { case (p, s) => addAction(p, s) })
    next
  }

  /** Remove `removePaths` (relative) and append `addDf`'s files in ONE
    * commit — the rewrite shape (compaction, copy-on-write update) every
    * Delta writer publishes. Returns the committed version.
    */
  def commitReplace(root: String,
      removePaths: Seq[String], addDf: DataFrame,
      expectedVersion: Option[Long] = None): Long = {
    val next = expectedVersion.getOrElse(currentVersion(root)) + 1
    val adds = writeDataFiles(root, next, addDf)
    publish(root, next,
      removePaths.map(removeAction) ++
        adds.map { case (p, s) => addAction(p, s) })
    next
  }

  /** Compact the live set at the current version into a parquet
    * checkpoint and point `_last_checkpoint` at it — future replays read
    * the checkpoint plus the commit tail only.
    */
  def checkpoint(spark: SparkSession, root: String): Long = {
    val v = currentVersion(root)
    require(v >= 0, s"no Delta log at $root to checkpoint")
    val rows = snapshotFiles(spark, root, Some(v)).map(p => Tuple1(p))
    // a Delta checkpoint is ONE parquet file, not a directory: write via a
    // scratch dir and move the single part file into place
    val tmp = s"$root/_delta_log/.ckpt-${java.util.UUID.randomUUID().toString.take(8)}"
    spark.createDataFrame(rows).toDF("path")
      .select(struct(col("path"), lit(0L).as("size"),
        lit(0L).as("modificationTime"), lit(true).as("dataChange")).as("add"))
      .coalesce(1)
      .write.parquet(tmp)
    val part = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"checkpoint write produced no parquet part in $tmp"))
    Files.move(part.toPath, checkpointPath(root, v),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    Files.write(logDir(root).resolve("_last_checkpoint"),
      s"""{"version":$v,"size":${rows.size}}""".getBytes("UTF-8"))
    v
  }
}
