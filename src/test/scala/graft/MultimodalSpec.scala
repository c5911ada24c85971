package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal._

/** Multimodal plumbing: binary payload columns, batched per-partition decode,
  * chunk sampling, metadata pruning.
  */
class MultimodalSpec extends SparkTestBase {

  private lazy val sparkStable = spark

  private def mediaDs = {
    import sparkStable.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 64).map { i =>
      val payload = Array.fill[Byte](128 + rnd.nextInt(512))((rnd.nextInt(256) - 128).toByte)
      MediaRecord(i.toLong, if (i % 3 == 0) "image" else "audio", payload,
        width = 32 * (i % 5), height = 32 * (i % 7), sampleRateHz = 16000)
    }.toDS()
  }

  test("feature extraction is deterministic, one vector per record, fixed dim") {
    implicit val s = spark
    val a = extractFeatures(mediaDs.repartition(8), () => new FakeDecoder(8)).collect()
    val b = extractFeatures(mediaDs.repartition(3), () => new FakeDecoder(8)).collect()
    assert(a.length == 64)
    assert(a.forall(_.features.length == 8))
    val am = a.map(f => f.mediaId -> f.features.toSeq).toMap
    val bm = b.map(f => f.mediaId -> f.features.toSeq).toMap
    assert(am == bm, "partitioning must not change decode output")
    assert(a.forall(f => f.nBytes >= 128))
  }

  test("chunk sampling emits every k-th fixed-size chunk") {
    val df = mediaDs.toDF("media_id", "media_type", "payload", "width", "height", "sample_rate_hz")
    val chunks = sampleChunks(df, chunkBytes = 64, everyK = 2)
    val rows = chunks.filter(col("media_id") === 0).orderBy(col("chunk_idx")).collect()
    assert(rows.nonEmpty)
    // every chunk except possibly the tail is exactly chunkBytes
    val sizes = rows.map(_.getAs[Array[Byte]]("chunk").length)
    assert(sizes.init.forall(_ == 64))
    assert(sizes.last <= 64 && sizes.last > 0)
  }

  test("resize transform updates payload and metadata for images only") {
    implicit val s = spark
    val resized = resizeImages(mediaDs, 16, 16).collect()
    resized.foreach { m =>
      if (m.mediaType == "image") {
        assert(m.width == 16 && m.height == 16)
        assert(m.payload.length == 32) // 16*16/8
      } else assert(m.width != 16 || m.payload.length != 32)
    }
    // deterministic
    val again = resizeImages(mediaDs.repartition(5), 16, 16).collect()
      .map(m => m.mediaId -> m.payload.toSeq).toMap
    assert(resized.map(m => m.mediaId -> m.payload.toSeq).toMap == again)
  }

  test("metadata pruning filters without touching payload bytes") {
    val df = mediaDs.toDF("media_id", "media_type", "payload", "width", "height", "sample_rate_hz")
    val pruned = filterByMeta(df, minW = 64, minH = 64)
    assert(!pruned.columns.contains("payload"), "payload must be pruned from the projection")
    val rows = pruned.collect()
    assert(rows.forall(r => r.getAs[Int]("width") >= 64 && r.getAs[Int]("height") >= 64))
    // plan-level check: the optimized plan's output does not carry payload
    val planStr = pruned.queryExecution.optimizedPlan.toString
    assert(!planStr.toLowerCase.contains("payload#") || !pruned.columns.contains("payload"))
  }
}
