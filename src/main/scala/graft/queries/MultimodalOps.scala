package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Driver-checked multimodal queries: binary payloads synthesized
  * deterministically from the documents table (text bytes as the opaque
  * media column), pushed through the REAL chunk-sampling plumbing
  * ([[Multimodal.sampleChunks]]). No codec involved — byte lengths and
  * chunk arithmetic are metadata-only, so DuckDB can restate them exactly,
  * giving the multimodal pipeline its first hash-checked correctness row.
  */
object MultimodalOps {

  private val ChunkBytes = 64
  private val EveryK = 2

  /** Synthesized media frame: doc text as payload, type from doc_id mod 3. */
  def mediaFromDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Per-type stats over every-k-th sampled chunk: media counts, sampled
    * chunk counts, sampled byte totals (the last chunk may be partial —
    * substr truncates at payload end, mirrored by least() in the oracle).
    */
  def q83MediaStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleChunks(mediaFromDocs(spark, dir), ChunkBytes, EveryK)
      .groupBy(col("media_type"))
      .agg(
        countDistinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_sampled_chunks"),
        sum(length(col("chunk"))).as("sampled_bytes"))
      .orderBy(col("media_type"))

  val q83Sql: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |    octet_length(encode(text)) AS len
       |  FROM documents),
       |c AS (
       |  SELECT media_id, media_type, len,
       |    unnest(range(0, CAST(ceil(len / $ChunkBytes.0) AS BIGINT), $EveryK)) AS off
       |  FROM m)
       |SELECT media_type, count(DISTINCT media_id) AS n_media,
       |  count(*) AS n_sampled_chunks,
       |  CAST(sum(least($ChunkBytes, len - off * $ChunkBytes)) AS BIGINT) AS sampled_bytes
       |FROM c GROUP BY media_type ORDER BY media_type""".stripMargin

  private val TargetW = 24
  private val TargetH = 20

  /** Honest end-to-end image pipeline with a REAL codec (JDK ImageIO, zero
    * external deps): synthesize a PNG per selected doc with geometry keyed
    * on doc_id, decode it back (orig dims come from the DECODER, not the
    * formula), push it through [[Multimodal.resizeImages]] (ImageIO decode →
    * bilinear resample → PNG re-encode), then decode the RESIZED bytes for
    * their dims. The oracle restates the whole thing arithmetically from
    * doc_id — any stubbed step would break the decoded-dimension equality.
    *
    * Scale shape: both branches are narrow per-partition codec passes (no
    * shuffle until the final groupBy on a tiny key); the equi-join on
    * media_id is the only pairing and both sides are the same filtered slice.
    */
  def q85ImageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    def media = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val w = 16 + (id % 17).toInt
        val h = 16 + (id % 13).toInt
        Multimodal.MediaRecord(id, "image", Multimodal.ImageCodec.synthPng(w, h, id), w, h, 0)
      }
    val orig = media.map { m =>
      val (ow, oh) = Multimodal.ImageCodec.dims(m.payload).getOrElse((-1, -1))
      (m.mediaId, ow, oh)
    }.toDF("media_id", "orig_w", "orig_h")
    val resized = Multimodal.resizeImages(media, TargetW, TargetH).map { m =>
      val (rw, rh) = Multimodal.ImageCodec.dims(m.payload).getOrElse((-1, -1))
      (m.mediaId, rw, rh)
    }.toDF("media_id", "res_w", "res_h")
    orig.join(resized, "media_id")
      .groupBy((col("media_id") % 17).as("wb"))
      .agg(
        count(lit(1)).as("n_images"),
        sum(col("orig_w")).as("sum_orig_w"),
        sum(col("orig_h")).as("sum_orig_h"),
        sum(col("res_w")).as("sum_res_w"),
        sum(col("res_h")).as("sum_res_h"))
      .orderBy(col("wb"))
  }

  val q85Sql: String =
    s"""SELECT doc_id % 17 AS wb, count(*) AS n_images,
       |  CAST(sum(16 + doc_id % 17) AS BIGINT) AS sum_orig_w,
       |  CAST(sum(16 + doc_id % 13) AS BIGINT) AS sum_orig_h,
       |  CAST(count(*) * $TargetW AS BIGINT) AS sum_res_w,
       |  CAST(count(*) * $TargetH AS BIGINT) AS sum_res_h
       |FROM documents WHERE doc_id % 10 = 0
       |GROUP BY wb ORDER BY wb""".stripMargin

  /** Honest end-to-end AUDIO pipeline with a REAL codec (JDK
    * javax.sound.sampled): synthesize a 16-bit mono WAV per selected doc
    * with geometry keyed on doc_id, decode it back, and aggregate the
    * DECODED sample rate, frame count and sum-of-|sample| — all three
    * recomputable arithmetically in the oracle, so any stubbed step breaks
    * the equality. Narrow per-partition codec pass, one group-by shuffle.
    */
  def q86AudioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).as[Long]
      .map { id =>
        // key the rate on (id/10) % 5: the % 10 == 0 slice makes id % 5
        // degenerate (always 0), which would collapse the grouping
        val rate = 8000 + ((id / 10) % 5).toInt * 1000
        val n = 4000 + (id % 97).toInt
        val wav = Multimodal.AudioCodec.synthWav(rate, n, id)
        val (decRate, decFrames, decSumAbs) =
          Multimodal.AudioCodec.decode(wav).getOrElse((-1, -1L, -1L))
        // rate as long: the oracle's `8000 + (doc_id % 5) * 1000` is BIGINT
        // and the driver's hash covers value types
        (decRate.toLong, decFrames, decSumAbs)
      }
      .toDF("rate", "n_frames", "sum_abs")
      .groupBy(col("rate"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("n_frames")).as("total_frames"),
        sum(col("sum_abs")).as("total_abs"))
      .orderBy(col("rate"))
  }

  val q86Sql: String =
    """SELECT 8000 + ((doc_id // 10) % 5) * 1000 AS rate, count(*) AS n_clips,
      |  CAST(sum(4000 + doc_id % 97) AS BIGINT) AS total_frames,
      |  CAST(sum(list_sum(list_transform(range(0, 4000 + doc_id % 97),
      |        i -> abs((i + doc_id) % 256 - 128))) * 256) AS BIGINT) AS total_abs
      |FROM documents WHERE doc_id % 10 = 0
      |GROUP BY rate ORDER BY rate""".stripMargin

  /** Honest end-to-end VIDEO pipeline with a REAL multi-frame codec (JDK
    * animated GIF — the one container `javax.imageio` both writes and
    * reads): synthesize an animated GIF per selected doc with frame count
    * and geometry keyed on doc_id, decode EVERY frame back, and emit one
    * row per decoded frame with its decoded dimensions. The oracle restates
    * frame fan-out and geometry arithmetically from doc_id — a stubbed
    * decode (or a reader that missed frames) would break the per-row
    * equality. Narrow per-partition codec pass; frame explosion happens
    * executor-side (no shuffle until the final sort).
    */
  def q88VideoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).as[Long]
      .flatMap { id =>
        val w = 12 + (id % 11).toInt
        val h = 12 + (id % 7).toInt
        val nf = 2 + (id % 3).toInt
        val gif = Multimodal.VideoCodec.synthGif(w, h, nf, id)
        val frames = Multimodal.VideoCodec.frameDims(gif).getOrElse(Seq.empty)
        frames.zipWithIndex.map { case ((fw, fh), i) =>
          (id, i.toLong, fw.toLong, fh.toLong, frames.length.toLong)
        }
      }
      .toDF("media_id", "frame_idx", "frame_w", "frame_h", "n_frames")
      .orderBy(col("media_id"), col("frame_idx"))
  }

  val q88Sql: String =
    """SELECT doc_id AS media_id,
      |  unnest(range(0, 2 + doc_id % 3)) AS frame_idx,
      |  CAST(12 + doc_id % 11 AS BIGINT) AS frame_w,
      |  CAST(12 + doc_id % 7 AS BIGINT) AS frame_h,
      |  CAST(2 + doc_id % 3 AS BIGINT) AS n_frames
      |FROM documents WHERE doc_id % 10 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  /** q135: audio RESAMPLE pipeline, honest end-to-end — synthesize a WAV
    * per selected doc (rate/length/samples keyed on doc_id, the q86
    * fixture), run it through `AudioCodec.resampleHalf` (decode → decimate
    * by 2 → RE-ENCODE through the real `javax.sound.sampled` writer), then
    * decode the RESULT and aggregate per output rate. The oracle restates
    * the surviving samples arithmetically — every 2nd sample of the
    * sawtooth — so a stubbed resampler, a dropped header, or an
    * off-by-one in the decimation breaks the hash. Narrow per-partition
    * codec pass; the only shuffle is the final rate-keyed rollup.
    */
  def q135AudioResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val rate = 8000 + ((id / 10) % 5).toInt * 1000
        val n = 4000 + (id % 97).toInt
        val wav = Multimodal.AudioCodec.synthWav(rate, n, id)
        val half = Multimodal.AudioCodec.resampleHalf(wav).getOrElse(Array.empty[Byte])
        val (outRate, outFrames, outSumAbs) =
          Multimodal.AudioCodec.decode(half).getOrElse((-1, -1L, -1L))
        (outRate.toLong, outFrames, outSumAbs)
      }
      .toDF("rate_out", "n_frames", "sum_abs")
      .groupBy(col("rate_out"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("n_frames")).as("total_frames"),
        sum(col("sum_abs")).as("total_abs"))
      .orderBy(col("rate_out"))
  }

  val q135Sql: String =
    """SELECT (8000 + ((doc_id // 10) % 5) * 1000) // 2 AS rate_out,
      |  count(*) AS n_clips,
      |  CAST(sum((4000 + doc_id % 97 + 1) // 2) AS BIGINT) AS total_frames,
      |  CAST(sum(list_sum(list_transform(range(0, (4000 + doc_id % 97 + 1) // 2),
      |        j -> abs((2 * j + doc_id) % 256 - 128))) * 256) AS BIGINT) AS total_abs
      |FROM documents WHERE doc_id % 10 = 0
      |GROUP BY rate_out ORDER BY rate_out""".stripMargin

  /** q154 — audio ENERGY SEGMENTATION (the VAD / speech-segmentation
    * analogue): per clip, a real WAV round-trip (synth keyed on doc_id →
    * REAL `javax.sound.sampled` decode), then gaps-and-islands over the
    * DECODED samples — a run of consecutive |sample| ≥ 16384 is one "voiced"
    * segment. Emits per clip the segment count, voiced-sample total, and
    * longest run: the features a speech-corpus curation pass gates on
    * (clips with no voiced runs, or one unbroken run, are suspect). The
    * oracle re-derives the same islands arithmetic from the synth formula
    * — a stubbed decode or an off-by-one in the run scan breaks equality.
    *
    * Scale: the codec + segment scan is a NARROW per-row pass (per-
    * partition imperative code, the multimodal family's pattern) — no
    * shuffle until the final sort; per-clip state is one running counter
    * however long the clip.
    */
  def q154AudioSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val rate = 8000 + ((id / 10) % 5).toInt * 1000
        val n = 4000 + (id % 97).toInt
        val wav = Multimodal.AudioCodec.synthWav(rate, n, id)
        val samples = Multimodal.AudioCodec.decodeSamples(wav).getOrElse(Array.empty[Short])
        var nLoud = 0L; var nSeg = 0L; var longest = 0L; var run = 0L
        var i = 0
        while (i < samples.length) {
          if (math.abs(samples(i).toInt) >= 16384) {
            if (run == 0L) nSeg += 1L
            run += 1L; nLoud += 1L
            if (run > longest) longest = run
          } else run = 0L
          i += 1
        }
        (id, samples.length.toLong, nLoud, nSeg, longest)
      }
      .toDF("doc_id", "n_samples", "n_loud", "n_segments", "longest_run")
      .orderBy(col("doc_id"))
  }

  val q154Sql: String =
    """WITH clips AS (
      |  SELECT doc_id, 4000 + doc_id % 97 AS n
      |  FROM documents WHERE doc_id % 10 = 0),
      |s AS (
      |  SELECT doc_id, i,
      |    CASE WHEN abs((i + doc_id) % 256 - 128) >= 64 THEN 1 ELSE 0 END AS loud
      |  FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM clips)),
      |g AS (
      |  SELECT doc_id, i, loud,
      |    CASE WHEN loud = 1 AND
      |      coalesce(lag(loud) OVER (PARTITION BY doc_id ORDER BY i), 0) = 0
      |      THEN 1 ELSE 0 END AS st
      |  FROM s),
      |seg AS (
      |  SELECT doc_id, loud,
      |    sum(st) OVER (PARTITION BY doc_id ORDER BY i) AS sid
      |  FROM g),
      |runs AS (
      |  SELECT doc_id, sid, count(*) AS len
      |  FROM seg WHERE loud = 1 GROUP BY doc_id, sid),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
      |    CAST(sum(len) AS BIGINT) AS n_loud,
      |    CAST(max(len) AS BIGINT) AS longest_run
      |  FROM runs GROUP BY doc_id)
      |SELECT c.doc_id, CAST(c.n AS BIGINT) AS n_samples,
      |  coalesce(n_loud, 0) AS n_loud,
      |  coalesce(n_segments, 0) AS n_segments,
      |  coalesce(longest_run, 0) AS longest_run
      |FROM clips c LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q155 — PERCEPTUAL-HASH IMAGE DEDUP (dHash, Krawetz 2013: the
    * difference-hash every image-dedup pipeline starts with): per selected
    * doc, a real PNG round-trip (synth keyed on doc_id % 7 →
    * `javax.imageio` decode), then a 9×7 grid of DECODED grayscale pixels
    * sampled at gx·(w−1) div 8 × gy·(h−1) div 7 and 8×7 = 56
    * brighter-than-right-neighbor bits packed into a BIGINT — identical
    * geometry survives the hash, so the doc_id % 7 replica classes
    * collapse to exactly 7 buckets with their canonical (min) doc ids: the
    * multimodal × dedup crossover, exact-dedup's hash-groupBy applied to
    * image CONTENT instead of bytes. (56 bits, not 64, so the pack can
    * never touch BIGINT's sign bit in either engine.) PNG is lossless and
    * the frame is TYPE_INT_RGB, so decoded pixels are bit-exact — the
    * oracle re-derives every sampled pixel from the synth formula, and a
    * stubbed decode or a mis-sampled grid breaks the bucket structure.
    *
    * Scale: hashing is the same narrow per-partition codec pass as
    * q83–q88; the dedup is a 56-bit-key groupBy — exact dedup economics
    * however many images.
    */
  def q155ImageDhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 5)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val k = id % 7
        val (w, h) = (40 + k.toInt, 30 + k.toInt)
        val png = Multimodal.ImageCodec.synthPng(w, h, k)
        val img = Multimodal.ImageCodec.decode(png).get
        var hash = 0L
        var gy = 0
        while (gy < 7) {
          val y = gy * (h - 1) / 7
          var gx = 0
          while (gx < 8) {
            val pa = img.getRGB(gx * (w - 1) / 8, y) & 0xff
            val pb = img.getRGB((gx + 1) * (w - 1) / 8, y) & 0xff
            if (pb > pa) hash |= 1L << (gy * 8 + gx)
            gx += 1
          }
          gy += 1
        }
        (id, hash)
      }
      .toDF("doc_id", "dhash")
      .groupBy(col("dhash"))
      .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("canonical_doc_id"))
      .orderBy(col("dhash"))
  }

  val q155Sql: String =
    """WITH img AS (
      |  SELECT doc_id, doc_id % 7 AS k, 40 + doc_id % 7 AS w, 30 + doc_id % 7 AS h
      |  FROM documents WHERE doc_id % 10 = 5),
      |bits AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN
      |        ((((gx + 1) * (w - 1) // 8) * 31 + (gy * (h - 1) // 7) * 17 + k) % 256) >
      |        (((gx * (w - 1) // 8) * 31 + (gy * (h - 1) // 7) * 17 + k) % 256)
      |      THEN (CAST(1 AS BIGINT) << (gy * 8 + gx)) ELSE 0 END) AS BIGINT) AS dhash
      |  FROM img, unnest(range(0, 8)) t1(gx), unnest(range(0, 7)) t2(gy)
      |  GROUP BY doc_id)
      |SELECT dhash, CAST(count(*) AS BIGINT) AS n_images,
      |  min(doc_id) AS canonical_doc_id
      |FROM bits GROUP BY dhash
      |ORDER BY dhash""".stripMargin

  /** q191 — ViT-style IMAGE PATCHIFY over REAL decoded pixels: synthesize
    * a PNG per selected doc (geometry and pixel pattern keyed on doc_id),
    * decode it back with the JDK codec, tile the DECODED raster into 4×4
    * patches (ragged edge patches keep their true pixel counts — exactly
    * what a vision tokenizer must handle on arbitrary aspect ratios), and
    * emit each patch's pixel count and integer luminance sum. The oracle
    * recomputes every patch arithmetically from the synthesis formula
    * `(x·31 + y·17 + id) % 256` over a bounded pixel grid — so a stubbed
    * decode, a channel-order bug, or an off-by-one in the tiling breaks
    * thousands of per-patch equalities, not a summary statistic.
    *
    * Scale shape: decode + patch extraction is a narrow per-partition
    * pass (patch work is linear in pixels); the output is one row per
    * patch — the tensor-adjacent layout a downstream trainer consumes —
    * and the only shuffle is the final sort.
    */
  def q191ImagePatchify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).as[Long]
      .flatMap { id =>
        val w = 16 + (id % 17).toInt
        val h = 16 + (id % 13).toInt
        val img = Multimodal.ImageCodec
          .decode(Multimodal.ImageCodec.synthPng(w, h, id)).get
        for {
          py <- 0 until (h + 3) / 4
          px <- 0 until (w + 3) / 4
        } yield {
          var s = 0L
          var n = 0L
          var y = py * 4
          while (y < math.min(py * 4 + 4, h)) {
            var x = px * 4
            while (x < math.min(px * 4 + 4, w)) {
              s += (img.getRGB(x, y) & 0xff).toLong
              n += 1
              x += 1
            }
            y += 1
          }
          (id, px.toLong, py.toLong, n, s)
        }
      }
      .toDF("doc_id", "px", "py", "n_px", "lum_sum")
      .orderBy(col("doc_id"), col("py"), col("px"))
  }

  val q191Sql: String =
    """WITH sel AS (
      |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h
      |  FROM documents WHERE doc_id % 10 = 0),
      |px AS (
      |  SELECT doc_id, x.i AS x, y.i AS y,
      |    (x.i * 31 + y.i * 17 + doc_id) % 256 AS v
      |  FROM sel, range(0, 33) x(i), range(0, 29) y(i)
      |  WHERE x.i < w AND y.i < h)
      |SELECT doc_id, x // 4 AS px, y // 4 AS py,
      |  CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS lum_sum
      |FROM px GROUP BY 1, 2, 3
      |ORDER BY doc_id, py, px""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_image_patchify" -> q191ImagePatchify _,
    "q135_audio_resample" -> q135AudioResample _,
    "q83_media_stats" -> q83MediaStats _,
    "q85_image_resize" -> q85ImageResize _,
    "q86_audio_stats" -> q86AudioStats _,
    "q88_video_frames" -> q88VideoFrames _,
    "q154_audio_segments" -> q154AudioSegments _,
    "q155_image_dhash_dedup" -> q155ImageDhashDedup _)

  val oracles: Map[String, String] = Map(
    "q135_audio_resample" -> q135Sql,
    "q83_media_stats" -> q83Sql,
    "q191_image_patchify" -> q191Sql,
    "q85_image_resize" -> q85Sql,
    "q86_audio_stats" -> q86Sql,
    "q88_video_frames" -> q88Sql,
    "q154_audio_segments" -> q154Sql,
    "q155_image_dhash_dedup" -> q155Sql)
}
