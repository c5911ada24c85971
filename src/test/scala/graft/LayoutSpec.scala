package graft

import org.apache.spark.sql.functions._

import graft.queries.LayoutOps

/** Semantic guarantees of the layout-maintenance operators beyond the
  * oracle's bit-exactness: the compaction plan's bin-packing invariants
  * (q178) and the ORC round-trip's losslessness against the parquet
  * originals (q180).
  */
class LayoutSpec extends SparkTestBase {

  test("q178 compaction plan: bins conserve bytes, stay contiguous, and respect next-fit") {
    val rows = LayoutOps.q178CompactionPlan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // conservation: planned bytes == total document bytes
    val total = Tables(spark, sfDir, "documents")
      .agg(sum(col("n_chars"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("bytes")).sum == total,
      "the plan must cover every byte exactly once")
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("file_seq"))
      // bins are contiguous runs of the file order (next-fit never splits
      // or reorders — each compaction task reads a consecutive file range)
      val binSeq = ordered.map(_.getAs[Long]("bin_id"))
      assert(binSeq.sameElements(binSeq.sorted), s"$src: bins must be monotone in file order")
      // offset-binning invariants, checked from independently recomputed
      // cumulative offsets: every file's bin is the window its START
      // offset falls in, each non-last bin's files reach past its upper
      // boundary (that's what closed it), and dropping a bin's last file
      // pulls it back under the boundary (the last file is the crosser)
      val T = LayoutOps.Q178TargetBytes
      val offsets = ordered.map(_.getAs[Long]("bytes")).scanLeft(0L)(_ + _)
      ordered.zip(offsets).foreach { case (r, off) =>
        assert(r.getAs[Long]("bin_id") == off / T,
          s"$src file ${r.getAs[Long]("file_seq")}: bin must be its start-offset window")
      }
      val byBin = ordered.zip(offsets).groupBy(_._1.getAs[Long]("bin_id")).toSeq.sortBy(_._1)
      byBin.dropRight(1).foreach { case (bin, files) =>
        val end = files.map { case (r, off) => off + r.getAs[Long]("bytes") }.max
        assert(end >= (bin + 1) * T, s"$src bin $bin: closed without crossing its boundary")
      }
      byBin.foreach { case (bin, files) =>
        val lastStart = files.map(_._2).max
        assert(lastStart < (bin + 1) * T,
          s"$src bin $bin: a file starting past the boundary belongs to the next bin")
      }
      // bin_bytes/bin_files annotations agree with the membership
      byBin.foreach { case (_, files) =>
        val bytes = files.map(_._1.getAs[Long]("bytes")).sum
        assert(files.forall(_._1.getAs[Long]("bin_bytes") == bytes))
        assert(files.forall(_._1.getAs[Long]("bin_files") == files.length.toLong))
      }
    }
  }

  test("q178 is idempotent: re-planning the unchanged inventory reproduces the plan") {
    val a = LayoutOps.q178CompactionPlan(spark, sfDir).collect().toSeq
    val b = LayoutOps.q178CompactionPlan(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("q180 ORC aggregate equals the same aggregate computed from the parquet originals") {
    val viaOrc = LayoutOps.q180OrcRoundtrip(spark, sfDir).collect()
    assert(viaOrc.nonEmpty)
    val viaParquet = Tables(spark, sfDir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        expr("bit_xor(CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT))")
          .cast("long").as("content_hash"))
      .orderBy(col("lang")).collect()
    assert(viaOrc.toSeq == viaParquet.toSeq,
      "ORC write->read must preserve every row and every byte of text")
  }
}
