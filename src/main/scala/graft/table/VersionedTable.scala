package graft.table

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRANSACTIONAL VERSIONED TABLE — a lakehouse-style commit log over
  * immutable parquet data files, generalizing the `_version`
  * optimistic-lock idiom of [[graft.ingest.BatchRunStore]] (the
  * reference's per-run conditional write, `lib/batchProcessing.js:288,548`)
  * from ONE run row to a WHOLE table:
  *
  *   - every commit produces version v+1 and a manifest listing the data
  *     files it adds and removes; data files themselves are immutable;
  *   - reads PIN a version: `read(k)` reconstructs the exact snapshot any
  *     reader at version k saw, forever (time travel);
  *   - a writer must present the version it based its work on; if another
  *     writer committed first, publication fails LOUDLY instead of
  *     clobbering (optimistic concurrency, detected at the commit point).
  *
  * == Storage layout ==
  * {{{
  *   <root>/_log/v<NNNNNNNN>.manifest   — one tiny text file per version
  *   <root>/data/c<N>/b=<bucket>/part-....parquet — files of commit N
  * }}}
  * A manifest line is `add <bucket> <relative-path>` or `remove
  * <relative-path>`; the live file set at version k is the adds of
  * versions 1..k minus the removes of versions 1..k. Manifests are
  * VERSION-SIZED (a few lines), never data-sized — listing the live set
  * for any version is driver-side string work, exactly like Delta/Iceberg
  * log replay.
  *
  * == Commit protocol (put-if-absent) ==
  * Data files are written FIRST, under a directory only this commit uses
  * (`data/c<N>/`); the commit becomes visible only when
  * `_log/v<N>.manifest` is published with an ATOMIC create-new
  * (`StandardOpenOption.CREATE_NEW` — the local-FS analogue of an object
  * store's if-none-match put or a log service's conditional append). Two
  * writers who both read version v and both try to publish v+1 race on
  * that create: exactly one wins, the loser gets
  * [[java.util.ConcurrentModificationException]] and its orphaned data
  * directory is invisible to every reader (GC'd out of band, as in any
  * lakehouse). The conflict check is therefore not a lock around the
  * merge work — both writers do their copy-on-write in parallel — but a
  * single atomic point at publication, which is what lets a 1000-executor
  * merge run lock-free.
  *
  * == Copy-on-write merge, bucket-pruned ==
  * Rows hash into [[nBuckets]] buckets by key (`pmod(key, nBuckets)`), and
  * each commit's files are bucket-pure (written `partitionBy` bucket). A
  * merge therefore rewrites ONLY the buckets its change batch touches:
  * the touched-bucket set is collected from the (tiny, aggregated)
  * changes frame, untouched files carry over by reference in the
  * manifest, and the rewrite reads + full-outer-joins just the touched
  * fraction. At 100 TB with a 4096-bucket table, a change batch touching
  * 1% of keys rewrites ~1% of the data and moves zero bytes for the rest
  * — manifest lines, not file copies. The join itself co-partitions both
  * sides on the key, and because each side is already bucket-pruned the
  * shuffle is change-sized + touched-snapshot-sized, never table-sized.
  *
  * Within-batch semantics match q134's CDC contract: `delete` wins over
  * `upsert` for the same key; an upsert REPLACES the whole payload row;
  * deletes of absent keys are no-ops.
  *
  * @param keyCol  the table's primary-key column (must be LongType)
  * @param nBuckets number of key buckets — the copy-on-write granularity
  */
final class VersionedTable(
    spark: SparkSession,
    root: String,
    keyCol: String,
    nBuckets: Int = 16) {

  private val logDir = Paths.get(root, "_log")
  private def manifestPath(v: Long) =
    logDir.resolve(f"v$v%08d.manifest")

  /** Highest committed version, 0 if the table doesn't exist yet. */
  def currentVersion(): Long =
    if (!Files.isDirectory(logDir)) 0L
    else {
      val stream = Files.list(logDir)
      val vs =
        try stream.toArray.map(_.toString)
          .map(p => Paths.get(p).getFileName.toString)
          .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
            s.stripPrefix("v").stripSuffix(".manifest").toLong
          }
        finally stream.close()
      if (vs.isEmpty) 0L else vs.max
    }

  /** Live (bucket, relative-path) pairs as of version `v`: replay the
    * manifests 1..v. Driver-side string work, version-count-sized.
    */
  private def liveFiles(v: Long): Seq[(Int, String)] = {
    require(v >= 1 && v <= currentVersion(),
      s"version $v out of range [1, ${currentVersion()}]")
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    (1L to v).foreach { i =>
      Files.readAllLines(manifestPath(i)).forEach { line =>
        line.split(" ", 3) match {
          case Array("add", b, p) => live(p) = b.toInt
          case Array("remove", p) => live.remove(p)
          case _ => // blank / header line
        }
      }
    }
    live.toSeq.map { case (p, b) => (b, p) }
  }

  /** The snapshot exactly as version `v` committed it — time travel. */
  def read(v: Long): DataFrame = {
    val paths = liveFiles(v).map { case (_, p) => s"$root/$p" }
    if (paths.isEmpty)
      spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
  }

  /** The latest snapshot. */
  def readLatest(): DataFrame = read(currentVersion())

  private def bucketOf(c: org.apache.spark.sql.Column) =
    pmod(c, lit(nBuckets)).cast("int")

  /** Write `df` (key + payload columns) as this commit ATTEMPT's data
    * files — the directory is unique per attempt (not per version), so two
    * racing writers both write freely and only the manifest publish
    * decides; the loser's directory is never referenced by any manifest.
    * One bucket-pure subdirectory per touched bucket; returns the adds.
    */
  private def writeDataFiles(df: DataFrame, n: Long): Seq[(Int, String)] = {
    val dataDir =
      s"data/c$n-${java.util.UUID.randomUUID().toString.take(8)}"
    df.withColumn("b", bucketOf(col(keyCol)))
      .repartition(col("b")) // one shuffle: co-locate each bucket's rows
      .write.partitionBy("b").parquet(s"$root/$dataDir")
    val out = new java.io.File(s"$root/$dataDir")
    Option(out.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b="))
      .map(f => (f.getName.stripPrefix("b=").toInt, s"$dataDir/${f.getName}"))
      .toSeq.sortBy(_._1)
  }

  /** Publish manifest `v` atomically; throws
    * [[java.util.ConcurrentModificationException]] if another writer
    * already published it (the put-if-absent race — the loser's data dir
    * stays invisible).
    */
  private def publish(v: Long, basedOn: Long, lines: Seq[String]): Unit = {
    Files.createDirectories(logDir)
    val body = (s"version $v basedOn $basedOn" +: lines).mkString("", "\n", "\n")
    try
      Files.write(manifestPath(v), body.getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"VersionedTable $root: cannot commit version $v based on " +
            s"$basedOn — a concurrent writer already committed $v; " +
            "re-read the table and retry the merge")
    }
  }

  /** Create the table at version 1 from a full snapshot. */
  def init(df: DataFrame): Long = {
    require(currentVersion() == 0L, s"table $root already exists")
    val adds = writeDataFiles(df, 1L)
    publish(1L, 0L, adds.map { case (b, p) => s"add $b $p" })
    1L
  }

  /** Copy-on-write CDC merge: apply `changes` — (key, `op` ∈
    * {upsert, delete}, payload columns matching the table's) — on top of
    * `expectedVersion`, committing `expectedVersion + 1`. Only buckets
    * present in `changes` are rewritten; every other live file carries
    * over by reference. Fails with ConcurrentModificationException if a
    * concurrent writer committed first.
    */
  def merge(changes: DataFrame, expectedVersion: Long): Long = {
    val next = expectedVersion + 1
    // resolve within-batch overlap: delete wins over upsert for one key
    val resolved = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol))
        .orderBy(when(col("op") === "delete", 0).otherwise(1))
      changes.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1).drop("_rk")
    }
    // the copy-on-write pruning set: tiny (≤ nBuckets), driver-collected
    val touched = resolved.select(bucketOf(col(keyCol)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val live = liveFiles(expectedVersion)
    val (oldTouched, carried) = live.partition { case (b, _) => touched(b) }
    val payloadCols = resolved.columns.filter(c => c != keyCol && c != "op")
    val old =
      if (oldTouched.isEmpty) {
        val empty = resolved.drop("op")
        empty.filter(lit(false))
      } else
        spark.read.parquet(oldTouched.map { case (_, p) => s"$root/$p" }: _*)
    // MERGE INTO kernel: one full-outer join co-partitioned on the key,
    // both sides already pruned to the touched buckets
    val ch = resolved.select(
      col(keyCol) +: col("op").as("_op") +:
        payloadCols.map(c => col(c).as(s"_new_$c")): _*)
    val merged = old.join(ch, Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") === "upsert")
      .select(
        col(keyCol) +: payloadCols.map { c =>
          when(col("_op") === "upsert", col(s"_new_$c")).otherwise(col(c)).as(c)
        }: _*)
    val adds = writeDataFiles(merged, next)
    val lines =
      oldTouched.map { case (_, p) => s"remove $p" } ++
        adds.map { case (b, p) => s"add $b $p" }
    publish(next, expectedVersion, lines)
    // carried files are untouched by construction; nothing to write
    require(carried.forall { case (b, _) => !touched(b) })
    next
  }
}
