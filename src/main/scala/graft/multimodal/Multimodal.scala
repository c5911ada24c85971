package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch decoders.
  *
  * The Spark-side architecture is real and tested — schema contract,
  * partition sizing, batched decode via `mapPartitions` (the Scala analogue
  * of Python's `mapInPandas`: one decoder instantiation per partition, not
  * per row), feature columns as `array<float>`. The actual codec call is
  * stubbed behind [[MediaDecoder]] (no image/audio libs in this
  * environment) with a deterministic fake for tests; swapping in a real
  * JNI/Java decoder is a one-class change.
  */
object Multimodal {

  /** A media row: opaque payload + the metadata a curation pipeline tracks. */
  final case class MediaRecord(
      mediaId: Long,
      mediaType: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sampleRateHz: Int)

  final case class MediaFeatures(
      mediaId: Long,
      mediaType: String,
      nBytes: Long,
      features: Array[Float])

  /** The pluggable decode step. Implementations MUST be serializable and
    * cheap to construct once per partition.
    */
  trait MediaDecoder extends Serializable {
    /** Decode one payload to a fixed-dim feature vector. */
    def decode(payload: Array[Byte], mediaType: String): Array[Float]
    def dim: Int
  }

  /** Deterministic stand-in for a real codec: features derived from payload
    * bytes via a rolling hash — stable across runs/executors, so specs can
    * assert exact values. Replace with an actual decoder (e.g. TwelveMonkeys
    * ImageIO / FFmpeg JNI) in production; the pipeline shape is identical.
    */
  final class FakeDecoder(val dim: Int = 8) extends MediaDecoder {
    def decode(payload: Array[Byte], mediaType: String): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out(0) += (h & 0xffff).toFloat / 65536.0f
      out
    }
  }

  /** Batched feature extraction: one decoder per partition, rows streamed
    * through it — at 100 TB each task decodes its split independently
    * (embarrassingly parallel, no shuffle). Partition sizing is the caller's
    * lever: binary payloads are large, so repartition to keep partitions
    * under executor memory (e.g. `spark.sql.files.maxPartitionBytes`).
    */
  def extractFeatures(media: Dataset[MediaRecord], mkDecoder: () => MediaDecoder)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val dec = mkDecoder() // once per partition, not per row
      it.map(m => MediaFeatures(m.mediaId, m.mediaType, m.payload.length.toLong,
        dec.decode(m.payload, m.mediaType)))
    }
  }

  /** Frame-sampling shape for video: emit every k-th chunk of the payload as
    * its own row (posexplode of deterministic chunk offsets) — the
    * "explode media into frames, then treat frames as images" pipeline.
    */
  def sampleChunks(media: DataFrame, chunkBytes: Int, everyK: Int): DataFrame =
    media
      .withColumn("n_chunks", ceil(length(col("payload")).cast("double") / chunkBytes).cast("int"))
      .select(col("media_id"), col("media_type"), col("payload"),
        posexplode(sequence(lit(0), greatest(col("n_chunks") - 1, lit(0)), lit(everyK)))
          .as(Seq("chunk_idx", "chunk_offset")))
      .select(col("media_id"), col("media_type"), col("chunk_idx"),
        col("payload").substr(col("chunk_offset") * chunkBytes + 1, lit(chunkBytes)).as("chunk"))

  /** Resize/transcode shape: payload -> payload per-partition transform with
    * updated metadata. The codec call is STUBBED (`resizeStub` — no image
    * libs in this environment): deterministic byte sampling stands in for
    * pixel resampling, so the Spark-side plumbing (schema, partition
    * batching, metadata update) is real and testable; swap the stub for an
    * ImageIO/FFmpeg call to productionize.
    */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val targetLen = math.max(1, targetW * targetH / 8)
    val out = new Array[Byte](targetLen)
    var i = 0
    while (i < targetLen) {
      out(i) = if (payload.isEmpty) 0 else payload((i.toLong * payload.length / targetLen).toInt)
      i += 1
    }
    out
  }

  def resizeImages(media: Dataset[MediaRecord], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      if (m.mediaType == "image")
        m.copy(payload = resizeStub(m.payload, targetW, targetH), width = targetW, height = targetH)
      else m
    })
  }

  /** Metadata-only pruning: the scan a curation job runs BEFORE any decode —
    * predicate pushdown on typed metadata avoids ever reading payload bytes
    * for filtered-out rows (column pruning keeps `payload` out of the scan).
    */
  def filterByMeta(media: DataFrame, minW: Int, minH: Int): DataFrame =
    media.filter(col("media_type") === "image" && col("width") >= minW && col("height") >= minH)
      .select(col("media_id"), col("width"), col("height"))
}
