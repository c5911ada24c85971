package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Layout + compliance maintenance for the engine's derived parquet
  * stores (the lexical store's `dl/`/`postings/`/`maxscore/`, the
  * signature store's `sigs/`/`bands/`/`pairs/`): file-level copy-on-write
  * erasure and bin-packed small-file compaction.
  *
  * Both operate at FILE granularity, the same unit every lakehouse
  * maintenance protocol uses (Delta OPTIMIZE / GDPR delete, Iceberg
  * rewrite_data_files): a rewrite touches only the files that need it,
  * every untouched file stays byte-identical in place, and the data pass
  * is a distributed Spark job — the driver handles only the file
  * MANIFEST (the listing), never rows.
  *
  * Local-filesystem note: publication here is directory swap / file move
  * plus a `_SUCCESS` mtime bump — the sandbox analogue of publishing the
  * rewritten file set via a `dataChange=false` Delta commit
  * ([[graft.sources.DeltaLog.commitRewrite]]), which is how the same
  * protocol lands on object storage where renames are not atomic.
  */
object StoreMaint {

  /** Every data file under `path` (recursive), excluding markers. */
  def dataFiles(path: String): Seq[Path] = {
    val root = Paths.get(path)
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq
    finally s.close()
  }

  /** Count of data files under `path` — the quantity scan cost degrades
    * with (footer reads, task scheduling) and compaction exists to bound.
    */
  def dataFileCount(path: String): Long = dataFiles(path).size.toLong

  private def uriToPath(fileName: String): Path = {
    val u = java.net.URI.create(fileName)
    if (u.getScheme == null) Paths.get(fileName) else Paths.get(u)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally s.close()
    }

  private def touchSuccess(path: String): Unit = {
    val m = Paths.get(path, "_SUCCESS")
    if (!Files.exists(m)) Files.createFile(m)
    Files.setLastModifiedTime(m,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
  }

  /** FILE-LEVEL COPY-ON-WRITE ERASURE: remove every row matching `hit`
    * from the parquet table at `path`, rewriting ONLY the files that
    * contain at least one matching row. This is the erasure-propagation
    * primitive for derived stores — at 100 TB the derived artifacts (an
    * inverted index's postings, a dedup store's signatures) ARE the
    * compliance surface, and a "right to be forgotten" request that
    * rewrote the whole store per batch would be a full-table write per
    * nightly job instead of one bounded by the subjects' footprint.
    *
    * Protocol (the q214 copy-on-write merge at file granularity):
    *  1. one distributed scan finds the DISTINCT FILES holding matching
    *     rows (`input_file_name()` + the predicate — filter pushdown and
    *     partition pruning apply, so a predicate keyed to the table's
    *     partition scheme touches only its partitions); the collected
    *     hit list is manifest-sized, the same driver frame every
    *     lakehouse delete materializes;
    *  2. the hit files ALONE are re-read (partition columns recovered via
    *     `basePath`) and their surviving rows written to a staging dir
    *     with the same partitioning;
    *  3. staged files move into place, hit files are deleted, `_SUCCESS`
    *     is bumped so freshness contracts see the new version.
    *
    * Returns the number of rewritten (hit) files — 0 means the predicate
    * matched nothing and the store was not touched at all.
    */
  def eraseWhere(spark: SparkSession, path: String,
      partitionCols: Seq[String], hit: Column): Long = {
    // null-safe on BOTH sides: a row where the predicate evaluates to
    // NULL is not a hit (<=> true is false), and it must be KEPT when its
    // file is rewritten for other rows' sake — a plain !hit would drop it
    // from the survivors too, silently deleting rows the request never
    // named. `hit <=> true` / `!(hit <=> true)` partition every row.
    val hitTrue = hit <=> lit(true)
    val hitFiles = spark.read.parquet(path)
      .withColumn("__file", input_file_name())
      .filter(hitTrue)
      .select(col("__file")).distinct()
      .collect().map(r => uriToPath(r.getString(0))).toSeq
    if (hitFiles.isEmpty) return 0L
    val survivors = spark.read.option("basePath", path)
      .parquet(hitFiles.map(_.toString): _*)
      .filter(!hitTrue)
    cowPublish(path, partitionCols, hitFiles, survivors)
  }

  /** [[eraseWhere]] keyed by a FRAME of subject keys instead of a Column
    * predicate — the CDC-consumer shape: a change feed's deleted keys
    * arrive as a DataFrame of arbitrary size, and an `isin` literal list
    * would put every key on the driver and in the plan. The hit scan is
    * a semi-join (AQE broadcasts a small key set; a huge erasure batch
    * shuffles like any join), survivors anti-join, same file-level
    * copy-on-write publish: only files holding a subject's rows rewrite.
    */
  def eraseKeys(spark: SparkSession, path: String, partitionCols: Seq[String],
      keyCol: String, keys: org.apache.spark.sql.DataFrame): Long = {
    if (!Files.isDirectory(Paths.get(path))) return 0L
    val k = keys.select(col(keyCol)).distinct()
    val hitFiles = spark.read.parquet(path)
      .withColumn("__file", input_file_name())
      .join(k, Seq(keyCol), "left_semi")
      .select(col("__file")).distinct()
      .collect().map(r => uriToPath(r.getString(0))).toSeq
    if (hitFiles.isEmpty) return 0L
    val survivors = spark.read.option("basePath", path)
      .parquet(hitFiles.map(_.toString): _*)
      .join(k, Seq(keyCol), "left_anti")
    cowPublish(path, partitionCols, hitFiles, survivors)
  }

  /** The copy-on-write publish both erase verbs share: staged survivors
    * in, hit files out, marker + manifest bumped.
    */
  private def cowPublish(path: String, partitionCols: Seq[String],
      hitFiles: Seq[Path],
      survivors: org.apache.spark.sql.DataFrame): Long = {
    val staging = Paths.get(path + ".cow")
    deleteRecursively(staging)
    val w = survivors.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staging.toString)
    dataFiles(staging.toString).foreach { f =>
      val rel = staging.relativize(f)
      val dest = Paths.get(path).resolve(rel)
      Files.createDirectories(dest.getParent)
      Files.move(f, dest, StandardCopyOption.REPLACE_EXISTING)
    }
    hitFiles.foreach(Files.deleteIfExists(_))
    deleteRecursively(staging)
    touchSuccess(path)
    StoreManifest.bumpPart(path)
    hitFiles.size.toLong
  }

  /** BIN-PACKED SMALL-FILE COMPACTION of the parquet table at `path`:
    * rewrite the accumulated per-trigger SMALL files into
    * `targetBytes`-sized outputs, preserving `partitionCols` layout.
    *
    * SMALL-FILE-AWARE: only files under `targetBytes` are rewrite
    * candidates, and only where merging is possible — a partition
    * directory holding a single small file is already as packed as this
    * pass can make it. Files at/over target (and lone small files) are
    * CARRIED untouched: never read, never moved, byte-identical after
    * the pass. That makes the maintenance job's own cost proportional to
    * the small-file TAIL, not the store — a 100 TB postings store
    * compacted nightly re-copies its fresh appends, not 100 TB — and a
    * second pass over an already-compacted store is a literal no-op
    * (returns 0, bumps nothing). This is the same candidate discipline
    * Delta OPTIMIZE (minFileSize) and [[VersionedTable.compact]]
    * (fragmented buckets only) apply.
    *
    * The rewrite itself is the q178 compaction planner made physical:
    * with `openCostInBytes = 0` and `maxPartitionBytes = targetBytes`,
    * Spark's FileSourceScan split planner runs EXACTLY the planner's
    * discipline — cumulative bytes next-fit into target-sized bins, one
    * scan task per bin — so each task reads one bin's small files and
    * writes one compacted file, with NO shuffle anywhere (the rewrite
    * moves bytes once, scan to writer, the Delta/Iceberg OPTIMIZE shape).
    * Re-running on an unchanged listing reproduces the identical binning
    * (idempotent maintenance).
    *
    * Publication is staged-file move-in + candidate delete (see class
    * note for the object-store analogue). Results are byte-for-byte the
    * same rows — callers' correctness gates (oracle hashes) must not
    * move. Returns the number of small files rewritten (0 = no-op).
    */
  def compact(spark: SparkSession, path: String,
      partitionCols: Seq[String], targetBytes: Long): Long = {
    val root = Paths.get(path)
    // candidates: under-target files in directories where a merge is
    // possible (>= 2 small files share the directory — with partitionBy
    // output routing, files can only ever merge within their partition)
    val candidates = dataFiles(path)
      .filter(f => Files.size(f) < targetBytes)
      .groupBy(_.getParent).values.filter(_.size >= 2).flatten.toSeq
    if (candidates.isEmpty) return 0L
    val staging = Paths.get(path + ".opt")
    deleteRecursively(staging)
    val conf = spark.conf
    // maxPartitionBytes = target and openCost = 0 make the split planner's
    // bin exactly `targetBytes` of real data; minPartitionNum = 1 stops the
    // planner shrinking bins to fill idle cores (bytesPerCore) — compaction
    // wants target-sized outputs, not cluster-width outputs
    val tuned = Seq(
      "spark.sql.files.maxPartitionBytes" -> targetBytes.toString,
      "spark.sql.files.openCostInBytes" -> "0",
      "spark.sql.files.minPartitionNum" -> "1")
    val saved = tuned.map { case (k, _) => k -> conf.getOption(k) }
    try {
      tuned.foreach { case (k, v) => conf.set(k, v) }
      // basePath recovers the partition columns from the candidate
      // files' directory layout, exactly like eraseWhere's hit read
      val df = spark.read.option("basePath", path)
        .parquet(candidates.map(_.toString): _*)
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(staging.toString)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
    // publish: staged outputs in (fresh UUID part names — no collision
    // with carried files), candidates out, marker bumped
    dataFiles(staging.toString).foreach { f =>
      val rel = staging.relativize(f)
      val dest = root.resolve(rel)
      Files.createDirectories(dest.getParent)
      Files.move(f, dest, StandardCopyOption.REPLACE_EXISTING)
    }
    candidates.foreach(Files.deleteIfExists(_))
    deleteRecursively(staging)
    touchSuccess(path)
    StoreManifest.bumpPart(path)
    candidates.size.toLong
  }
}
