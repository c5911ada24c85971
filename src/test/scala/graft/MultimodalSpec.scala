package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal._

/** Multimodal plumbing: binary payload columns, batched per-partition decode,
  * chunk sampling, metadata pruning.
  */
class MultimodalSpec extends SparkTestBase {

  private lazy val sparkStable = spark

  test("decodeSamples round-trips synthWav bit-for-bit (q154's decode path)") {
    val wav = graft.multimodal.Multimodal.AudioCodec.synthWav(8000, 1000, 42L)
    val s = graft.multimodal.Multimodal.AudioCodec.decodeSamples(wav).get
    assert(s.length == 1000)
    (0 until 1000).foreach { i =>
      assert(s(i) == ((((i + 42) % 256) - 128) * 256).toShort,
        s"sample $i decoded ${s(i)}")
    }
  }

  test("q155 dhash buckets are exactly the doc_id % 7 replica classes with their min-doc canonicals") {
    val rows = graft.queries.MultimodalOps.q155ImageDhashDedup(spark, sfDir).collect()
    assert(rows.length == 7, s"7 distinct images must yield 7 buckets, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("dhash")).distinct.length == 7,
      "distinct content must hash apart")
    val expected = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 10 === 5)
      .groupBy((col("doc_id") % 7).as("k"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("canon"))
      .collect().map(r => r.getAs[Long]("canon") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val canon = r.getAs[Long]("canonical_doc_id")
      assert(expected.get(canon).contains(r.getAs[Long]("n_images")),
        s"bucket $r must match its replica class ${expected.get(canon)}")
    }
  }

  test("q154 segment invariants: runs partition the loud samples, every clip has voiced runs") {
    val rows = graft.queries.MultimodalOps.q154AudioSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, loud, segs, longest) = (r.getAs[Long]("n_samples"), r.getAs[Long]("n_loud"),
        r.getAs[Long]("n_segments"), r.getAs[Long]("longest_run"))
      assert(loud <= n && longest <= loud, s"bounds violated: $r")
      assert(segs >= 1L && longest >= 1L,
        s"a >=4000-sample sawtooth must contain voiced runs: $r")
      assert(loud <= segs * longest, s"runs can't average past the longest: $r")
    }
  }

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

  test("ImageCodec round-trips real PNGs: encode -> decode -> resize -> re-decode") {
    val png = ImageCodec.synthPng(33, 21, seed = 7L)
    // PNG magic bytes prove a real encoder ran, not a byte-sampling stub
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte && png(2) == 'N'.toByte && png(3) == 'G'.toByte)
    assert(ImageCodec.dims(png).contains((33, 21)))
    val resized = ImageCodec.resizePng(png, 12, 9).get
    assert(ImageCodec.dims(resized).contains((12, 9)))
    // deterministic: same seed/geometry, same bytes
    assert(ImageCodec.synthPng(33, 21, 7L).toSeq == png.toSeq)
    // gradient content survives decode: pixel (0,0) is v|v|v with v = seed % 256
    val img = ImageCodec.decode(png).get
    assert((img.getRGB(0, 0) & 0xffffff) == 0x070707)
    // undecodable payloads are None, not an exception
    assert(ImageCodec.dims(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("resizeImages uses the real codec for decodable payloads") {
    implicit val s = spark
    import s.implicits._
    val media = (0 until 12).map { i =>
      MediaRecord(i.toLong, "image", ImageCodec.synthPng(16 + i, 20 + i, i.toLong),
        16 + i, 20 + i, 0)
    }.toDS()
    val out = resizeImages(media, 10, 8).collect()
    assert(out.length == 12)
    out.foreach { m =>
      assert(m.width == 10 && m.height == 8)
      // the payload is a real PNG at the target geometry — a stub could not
      // produce bytes ImageIO decodes to (10, 8)
      assert(ImageCodec.dims(m.payload).contains((10, 8)))
    }
  }

  test("AudioCodec round-trips real WAVs: encode -> decode recovers rate, frames, samples") {
    val wav = AudioCodec.synthWav(rate = 11000, nSamples = 4321, seed = 9L)
    // RIFF/WAVE magic proves a real encoder ran
    assert(wav(0) == 'R'.toByte && wav(1) == 'I'.toByte && wav(2) == 'F'.toByte && wav(3) == 'F'.toByte)
    assert(new String(wav.slice(8, 12)) == "WAVE")
    val (rate, frames, sumAbs) = AudioCodec.decode(wav).get
    assert(rate == 11000 && frames == 4321L)
    // sum of |sample| is the synthesis arithmetic: sum |((i+9) % 256) - 128| * 256
    val expected = (0 until 4321).map(i => math.abs(((i + 9) % 256) - 128).toLong).sum * 256
    assert(sumAbs == expected, s"decoded $sumAbs != synthesized $expected")
    // deterministic; undecodable payloads are None, not an exception
    assert(AudioCodec.synthWav(11000, 4321, 9L).toSeq == wav.toSeq)
    assert(AudioCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("AudioCodec.resampleHalf halves rate, keeps every 2nd sample, survives re-encode") {
    import graft.multimodal.Multimodal.AudioCodec
    val (rate, n, seed) = (8000, 1001, 42L) // odd n: kept = (n+1)/2 = 501
    val wav = AudioCodec.synthWav(rate, n, seed)
    val half = AudioCodec.resampleHalf(wav).get
    val (outRate, outFrames, outSumAbs) = AudioCodec.decode(half).get
    assert(outRate == rate / 2, s"rate must halve: $outRate")
    assert(outFrames == (n + 1) / 2, s"frames must decimate to ceil(n/2): $outFrames")
    val expectedSum = (0 until (n + 1) / 2)
      .map(j => math.abs(((2 * j + seed) % 256 - 128) * 256)).sum
    assert(outSumAbs == expectedSum,
      s"decimated sample sum must match the even-index sawtooth: $outSumAbs vs $expectedSum")
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

  test("q191 patchify: pixels conserve per image, grids are complete, edge patches are ragged") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.MultimodalOps.q191ImagePatchify(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, ps) =>
      val w = 16 + (id % 17).toInt
      val h = 16 + (id % 13).toInt
      // every decoded pixel lands in exactly one patch
      assert(ps.map(_.getAs[Long]("n_px")).sum == w.toLong * h, s"doc $id pixel conservation")
      // the grid is the full ceil(w/4) x ceil(h/4) tiling
      assert(ps.length == ((w + 3) / 4) * ((h + 3) / 4), s"doc $id grid size")
      ps.foreach { p =>
        val (px, py, n) =
          (p.getAs[Long]("px"), p.getAs[Long]("py"), p.getAs[Long]("n_px"))
        val pw = math.min(4L, w - px * 4)
        val ph = math.min(4L, h - py * 4)
        assert(n == pw * ph, s"doc $id patch ($px,$py): ragged size must be $pw x $ph")
        // luminance sums are bounded by the 8-bit channel range
        assert(p.getAs[Long]("lum_sum") >= 0L && p.getAs[Long]("lum_sum") <= n * 255L)
      }
    }
  }
}
