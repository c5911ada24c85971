package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.SketchOps

/** Semantic guarantees of the deterministic sketches (q136 KMV, q137 CMS)
  * — the bounds the estimates are USEFUL for, beyond the oracle's
  * bit-exactness.
  */
class SketchSpec extends SparkTestBase {

  test("CMS estimate is one-sided: est >= true count for EVERY key, not just the reported top-5") {
    val e = Tables(spark, sfDir, "events")
    val truth = e.groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
    val est = SketchOps.cmsEstimate(truth, SketchOps.cmsCounters(e))
    val bad = est.filter(col("est_cnt") < col("true_cnt")).count()
    assert(bad == 0L, s"$bad keys under-estimated — collisions can only ADD in a CMS")
    // and the sketch is genuinely tiny
    assert(SketchOps.cmsCounters(e).count() <= 256L)
  }

  test("KMV with fewer than k distinct keys IS the exact set (est == exact, n_mins == exact)") {
    val tmp = Files.createTempDirectory("graft-kmv").toString
    // events fixture with 3 distinct users; ts written as LONG nanos, the
    // on-disk shape Tables.events expects
    spark.range(40).select(
        col("id").as("event_id"),
        (lit(1700000000L * 1000000000L) + col("id") * 1000000000L).as("ts"),
        pmod(col("id"), lit(3L)).as("user_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"), lit("").as("props"))
      .write.parquet(s"$tmp/events.parquet")
    val rows = SketchOps.q136KmvDistinct(spark, tmp).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_mins") == 3L)
    assert(r.getAs[Long]("est_distinct") == 3L, "below k the sketch is exact")
    assert(r.getAs[Long]("exact_distinct") == 3L)
  }

  test("q141 set algebra: estimates bracket truth, and below k the merged sketch is EXACT") {
    val rows = SketchOps.q141KmvSetOps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (eu, xu) = (r.getAs[Long]("est_union"), r.getAs[Long]("exact_union"))
      val (ei, xi) = (r.getAs[Long]("est_intersect"), r.getAs[Long]("exact_intersect"))
      assert(xi <= xu, "an intersection can never exceed its union")
      assert(ei <= eu, "the ratio estimator is capped by the union estimate")
      assert(eu >= xu / 4 && eu <= xu * 4,
        s"${r.getAs[String]("type_a")}x${r.getAs[String]("type_b")}: est_union $eu vs exact $xu")
    }
    // constructed corpus: 2 types sharing 2 of 3 users — under k distinct
    // hashes, so union-and-truncate degenerates to the exact set algebra
    val tmp = Files.createTempDirectory("graft-kmv-setops").toString
    spark.range(60).select(
        col("id").as("event_id"),
        (lit(1700000000L * 1000000000L) + col("id") * 1000000000L).as("ts"),
        pmod(col("id"), lit(3L)).as("user_id"),
        when(pmod(col("id"), lit(3L)) === 2L, lit("only_a"))
          .otherwise(when(pmod(col("id"), lit(6L)) < 3L, lit("a")).otherwise(lit("b")))
          .as("event_type"),
        lit(1.0).as("value"), lit("").as("props"))
      .write.parquet(s"$tmp/events.parquet")
    val small = SketchOps.q141KmvSetOps(spark, tmp).collect()
    small.foreach { r =>
      assert(r.getAs[Long]("est_union") == r.getAs[Long]("exact_union"),
        s"below k the union estimate must be exact: $r")
      assert(r.getAs[Long]("est_intersect") == r.getAs[Long]("exact_intersect"),
        s"below k the intersection estimate must be exact: $r")
    }
  }

  test("q151 merge identity: merged daily sketches == a sketch built directly from each window's full hash set") {
    val e = Tables(spark, sfDir, "events")
    // direct per-window sketch: every (window, hash) pair from scratch —
    // the expensive path q151's daily-merge replaces
    val dh = e.select(to_date(col("ts")).as("d"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val maxDay = dh.agg(max(col("d")).as("max_d"))
    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("h"))
    val direct = dh.crossJoin(broadcast(maxDay))
      .withColumn("day", explode(expr(
        "sequence(d, least(date_add(d, 6), max_d), interval 1 day)")))
      .select(col("day"), col("h")).distinct()
      .withColumn("rn", row_number().over(wm)).filter(col("rn") <= 8)
      .groupBy(col("day"))
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("n_mins"))
      .select(col("day"), col("n_mins"),
        when(col("n_mins") === 8L, expr("8070450532247928832 div kth_hash"))
          .otherwise(col("n_mins")).as("est_wau"))
      .orderBy(col("day")).collect().map(_.toSeq)
    val merged = SketchOps.q151RollingKmv(spark, sfDir)
      .select(col("day"), col("n_mins"), col("est_wau"))
      .collect().map(_.toSeq)
    assert(merged.toSeq == direct.toSeq,
      "union-then-truncate of daily k-mins must equal the window's own KMV sketch")
  }

  test("q153 sample is coordinated: shard bottom-k samples re-top-k to exactly the global sample") {
    val e = Tables(spark, sfDir, "events")
    val h = e.select(col("event_type"), col("value"),
      conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val direct = SketchOps.bottomK(h, 64, "event_type")
      .orderBy(col("event_type"), col("h")).collect().map(_.toSeq)
    // two "shards" by event_id parity — their bottom-64s unioned and
    // re-truncated must equal the single-pass sample bit-for-bit
    val ids = e.select(col("event_type"), col("value"), col("event_id"),
      conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val shards = Seq(0L, 1L).map { p =>
      SketchOps.bottomK(ids.filter(pmod(col("event_id"), lit(2L)) === p), 64, "event_type")
    }
    val merged = SketchOps.bottomK(
        shards.reduce(_.unionByName(_)).select(col("event_type"), col("value"), col("h")),
        64, "event_type")
      .orderBy(col("event_type"), col("h")).collect().map(_.toSeq)
    assert(merged.toSeq == direct.toSeq,
      "union-then-re-top-k of shard samples must equal the global bottom-k sample")
    // and the estimates bracket sanely: an order-statistic estimate is an
    // actual population value between the group's min and max
    val rows = SketchOps.q153SampleQuantiles(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("est_p50") <= r.getAs[Double]("est_p90"))
      assert(r.getAs[Double]("exact_p50") <= r.getAs[Double]("exact_p90"))
      assert(r.getAs[Long]("est_n") == 64L)
    }
  }

  test("q194 merge identity: merged daily quantile samples == the window's own bottom-k sample") {
    val e = Tables(spark, sfDir, "events")
    val h = e.select(col("event_type"), to_date(col("ts")).as("d"), col("value"),
      conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val maxDay = h.agg(max(col("d")).as("max_d"))
    def toWindows(df: org.apache.spark.sql.DataFrame) = df
      .crossJoin(broadcast(maxDay))
      .withColumn("end_day", explode(expr(
        "sequence(d, least(date_add(d, 6), max_d), interval 1 day)")))
      .select(col("event_type"), col("end_day"), col("value"), col("h"))
    // direct per-window sample from the FULL row set — the expensive path
    // the daily-merge replaces
    val direct = SketchOps.bottomK(toWindows(h), 64, "event_type", "end_day")
      .orderBy(col("event_type"), col("end_day"), col("h"))
      .collect().map(_.toSeq)
    val daily = SketchOps.bottomK(h, 64, "event_type", "d")
    val merged = SketchOps.bottomK(toWindows(daily), 64, "event_type", "end_day")
      .orderBy(col("event_type"), col("end_day"), col("h"))
      .collect().map(_.toSeq)
    assert(merged.toSeq == direct.toSeq,
      "union-then-re-top-k of daily samples must equal each window's global bottom-k")
    // order-statistic sanity on the registered row
    val rows = SketchOps.q194RollingQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("est_p50") <= r.getAs[Double]("est_p90"))
      assert(r.getAs[Double]("exact_p50") <= r.getAs[Double]("exact_p90"))
      assert(r.getAs[Long]("est_n") <= 64L)
      assert(r.getAs[Long]("est_n") <= r.getAs[Long]("exact_n"))
    }
  }

  test("q156 CMS inner product is a one-sided upper bound on the exact join size") {
    val r = SketchOps.q156CmsJoinSize(spark, sfDir).collect()
    assert(r.length == 1)
    val (est, exact) = (r.head.getAs[Long]("est_join_size"), r.head.getAs[Long]("exact_join_size"))
    assert(exact > 0L, "the fixture sides must actually join")
    assert(est >= exact, s"collision cross-terms only ADD: est $est < exact $exact")
    assert(est <= exact * 4, s"d=4 min should stay within 4x on the fixture: est $est vs $exact")
  }

  test("KMV at k=8 lands within 4x of the true cardinality on the fixture (deterministic)") {
    val rows = SketchOps.q136KmvDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_distinct").toDouble
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(est >= exact / 4 && est <= exact * 4,
        s"${r.getAs[String]("event_type")}: est $est vs exact $exact — k=8 should land within 4x")
    }
  }

  test("q177 HLL: shard registers max-merge to exactly the global registers") {
    val e = Tables(spark, sfDir, "events")
    val global = SketchOps.hllRegisters(e).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket")) -> r.getAs[Int]("rho"))
      .toMap
    // an arbitrary 2-way shard split; elementwise max is the HLL merge
    val a = SketchOps.hllRegisters(e.filter(pmod(col("event_id"), lit(2)) === 0))
    val b = SketchOps.hllRegisters(e.filter(pmod(col("event_id"), lit(2)) === 1))
    val merged = a.unionByName(b)
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("rho")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket")) -> r.getAs[Int]("rho"))
      .toMap
    assert(merged == global,
      "max-merged shard registers must be bit-identical to the one-pass registers")
  }

  test("q177 HLL: reader-side linear counting lands within 1.5x in the small range") {
    // the fixture's cardinalities sit far below 5/2·m, where the RAW
    // harmonic estimate legitimately over-shoots — the row deliberately
    // carries n_empty so the reader applies Flajolet's linear-counting
    // correction m·ln(m/V); this test IS that reader
    val rows = SketchOps.q177HllDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val m = SketchOps.HllM.toDouble
    rows.foreach { r =>
      assert(r.getAs[Long]("n_used") + r.getAs[Long]("n_empty") == SketchOps.HllM.toLong)
      // z_num is the harmonic sum in units of 2^-27: between m (all registers
      // saturated) and m * 2^27 (all empty)
      val z = r.getAs[Long]("z_num")
      assert(z >= SketchOps.HllM.toLong && z <= SketchOps.HllM.toLong * 134217728L)
      val v = r.getAs[Long]("n_empty").toDouble
      assert(v > 0, "fixture cardinalities are far below m — registers can't saturate")
      val corrected = m * math.log(m / v)
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(corrected >= exact / 1.5 && corrected <= exact * 1.5,
        s"${r.getAs[String]("event_type")}: linear-count $corrected vs exact $exact")
    }
  }

  test("q183 bitmap distinct IS exact on every window, and words are bounded state") {
    val rows = SketchOps.q183BitmapDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bitmap_distinct") == r.getAs[Long]("exact_distinct"),
        s"${r.getAs[String]("event_type")}@${r.getAs[Int]("end_day")}: " +
          "popcount of OR-merged words must equal brute countDistinct — exactness is the claim")
      // a window's words can't exceed distinct/1 nor undershoot distinct/32
      val (w, d) = (r.getAs[Long]("n_words"), r.getAs[Long]("bitmap_distinct"))
      assert(w <= d && d <= 32L * w, s"words $w vs distinct $d out of packing bounds")
    }
  }

  test("q243 sparse-id remap: counts invariant vs q183, words recover the ceil(N/32) bound") {
    val dense = SketchOps.q183BitmapDistinct(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("end_day")) ->
        (r.getAs[Long]("bitmap_distinct"), r.getAs[Long]("exact_distinct"))).toMap
    val rows = SketchOps.q243BitmapSparse(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length == dense.size)
    val nUsers = Tables(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    val wordCap = (nUsers + 31) / 32
    rows.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Int]("end_day"))
      // the sparsifier+dictionary is a bijection on user ids: every
      // distinct count must equal the dense build's, row for row
      assert((r.getAs[Long]("bitmap_distinct"), r.getAs[Long]("exact_distinct")) == dense(key),
        s"$key: remapped counts must equal q183's")
      // the remap's whole point: the word table obeys the dense-domain
      // bound again (raw sparse packing would give one word per user)
      assert(r.getAs[Long]("n_words") <= wordCap,
        s"$key: ${r.getAs[Long]("n_words")} words exceeds ceil($nUsers/32) = $wordCap")
    }
    // the gate is load-bearing: packing the RAW sparse ids blows it on
    // every window that holds more than ceil(N/32) users
    val raw = SketchOps.bitmapRolled(
      SketchOps.bitmapWords(SketchOps.bitmapCells(
        Tables(spark, sfDir, "events")
          .withColumn("user_id", col("user_id") * lit(SketchOps.Q243Spread) + lit(7L))
      ).distinct()),
      SketchOps.bitmapCells(
        Tables(spark, sfDir, "events")
          .withColumn("user_id", col("user_id") * lit(SketchOps.Q243Spread) + lit(7L))
      ).distinct()).collect()
    assert(raw.exists(_.getAs[Long]("n_words") > wordCap),
      "sparse fixture must be sparse enough that unpacked words break the bound")
  }

  test("q243 denseDict: partitioning-invariant, dense, order-preserving") {
    val ids = Tables(spark, sfDir, "events")
      .select((col("user_id") * lit(SketchOps.Q243Spread) + lit(7L)).as("sid"))
      .distinct()
    val a = SketchOps.denseDict(ids, "sid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SketchOps.denseDict(ids.repartition(7), "sid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "the dictionary must not depend on input partitioning")
    // dense [0, N) and order-preserving (= row_number over the global sort)
    val sorted = a.toSeq.sortBy(_._1)
    assert(sorted.map(_._2) == (0L until a.size.toLong),
      "ranks must be the dense order-preserving enumeration")
  }

  test("q177 HLL raw estimate lands within 1.5x in its proper (large-cardinality) regime") {
    val tmp = Files.createTempDirectory("graft-hll").toString
    val n = 50000L
    spark.range(n).select(
        col("id").as("event_id"),
        (lit(1700000000L * 1000000000L) + col("id") * 1000000000L).as("ts"),
        col("id").as("user_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"), lit("").as("props"))
      .write.parquet(s"$tmp/events.parquet")
    val r = SketchOps.q177HllDistinct(spark, tmp).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_empty") == 0L, "50k keys saturate all 64 registers")
    val est = r.head.getAs[Long]("est_hll").toDouble
    assert(est >= n / 1.5 && est <= n * 1.5,
      s"est $est vs exact $n — m=64 (13% stderr) should land well within 1.5x")
  }

  test("q210 union registers ARE the max-merge: inclusion-exclusion built from per-source sketches") {
    import graft.queries.SketchOps
    // driver-side reference at sf0.001: md5-32 registers per source, union
    // registers by elementwise max, estimates via the shared integral formula
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val toks = Tables(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .flatMap { r =>
        val src = r.getString(0)
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).map(src -> _)
      }.toSet
    def registers(srcs: Set[String]): Map[Long, Long] =
      toks.filter(t => srcs(t._1)).map(t => java.lang.Long.parseLong(md5hex(t._2).take(8), 16))
        .groupBy(_ / 67108864L)
        .view.mapValues { hs =>
          hs.map { h =>
            val rest = h % 67108864L
            val bits = rest.toBinaryString
            val padded = "0" * (26 - bits.length) + bits
            val p = padded.indexOf('1')
            if (p < 0) 27L else (p + 1).toLong
          }.max
        }.toMap
    def est(reg: Map[Long, Long]): Long = {
      val z = reg.values.map(r => 1L << (27 - r).toInt).sum +
        (64L - reg.size) * 134217728L
      (709L * 4096L * 134217728L) / (1000L * z)
    }
    val rows = SketchOps.q210HllOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(r.getAs[Long]("est_a") === est(registers(Set(a))), s"($a,$b) est_a")
      assert(r.getAs[Long]("est_b") === est(registers(Set(b))), s"($a,$b) est_b")
      assert(r.getAs[Long]("est_union") === est(registers(Set(a, b))), s"($a,$b) est_union")
      assert(r.getAs[Long]("est_intersect") ===
        math.max(0L, r.getAs[Long]("est_a") + r.getAs[Long]("est_b") - r.getAs[Long]("est_union")))
      val exactI = toks.filter(_._1 == a).map(_._2).intersect(toks.filter(_._1 == b).map(_._2)).size
      assert(r.getAs[Long]("exact_intersect") === exactI.toLong, s"($a,$b) exact")
    }
    // every unordered source pair appears exactly once
    val srcs = toks.map(_._1)
    assert(rows.length === srcs.size * (srcs.size - 1) / 2)
  }
}
