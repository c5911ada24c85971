package graft

import org.apache.spark.sql.functions._

import graft.queries.MiningOps

/** q175 association rules + q176 constraint audit (MiningOps). */
class MiningSpec extends SparkTestBase {

  test("q175 pair supports agree with a brute-force basket recount") {
    val out = MiningOps.q175AssocRules(spark, sfDir).collect()
    assert(out.nonEmpty)
    // brute force: collect baskets, count pairs in plain Scala
    val baskets = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .filter(_._2.size <= MiningOps.Q175MaxBasket).toMap
    val brute = collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, parts) <- baskets; s = parts.toSeq.sorted;
         i <- s.indices; j <- (i + 1) until s.size)
      brute((s(i), s(j))) = brute.getOrElse((s(i), s(j)), 0L) + 1
    val bruteFreq = brute.filter(_._2 >= MiningOps.Q175MinSupport)
    assert(out.length === bruteFreq.size)
    out.foreach { r =>
      val pa = r.getAs[Long]("pa"); val pb = r.getAs[Long]("pb")
      assert(pa < pb)
      assert(r.getAs[Long]("support") === bruteFreq((pa, pb)))
    }
  }

  test("q175 confidence/lift arithmetic identities hold on every row") {
    val itemSupport = {
      val baskets = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        .filter(_._2.size <= MiningOps.Q175MaxBasket).toMap
      (baskets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap,
        baskets.size.toLong)
    }
    val (supports, nOrders) = itemSupport
    MiningOps.q175AssocRules(spark, sfDir).collect().foreach { r =>
      val sup = r.getAs[Long]("support")
      val sa = r.getAs[Long]("s_a"); val sb = r.getAs[Long]("s_b")
      assert(sa === supports(r.getAs[Long]("pa")))
      assert(sb === supports(r.getAs[Long]("pb")))
      assert(sup <= math.min(sa, sb))
      assert(r.getAs[Long]("conf_bp") === 10000L * sup / sa)
      assert(r.getAs[Long]("conf_bp") <= 10000L)
      assert(r.getAs[Long]("lift_milli") === 1000L * sup * nOrders / sa / sb)
    }
  }

  test("q185 skyline equals the brute-force dominance scan, and is an antichain") {
    val got = MiningOps.q185Skyline(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Int]("p_size"),
        r.getAs[Long]("price_cents"))).toSet
    assert(got.nonEmpty)
    val pts = Tables(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_size"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("c")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def dominates(a: (Long, Int, Long), b: (Long, Int, Long)): Boolean =
      a._2 <= b._2 && a._3 <= b._3 && (a._2 < b._2 || a._3 < b._3)
    val brute = pts.filter(p => !pts.exists(q => dominates(q, p))).map(p => p).toSet
    assert(got == brute, "grid-collapse + staircase must equal O(n²) dominance")
    // no member dominates another (antichain property)
    got.foreach(a => got.foreach(b =>
      assert(a == b || !dominates(a, b), s"$a dominates $b inside the skyline")))
  }

  test("q186 MAD stats equal a driver-side recomputation, outlier count included") {
    val rows = MiningOps.q186MadOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val data = Tables(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val vs = data(t)
      // percentile_disc: the element at rank ceil(n/2) under (value, id) order
      def disc(xs: Seq[(Double, Long)]): Double = {
        val sorted = xs.sortBy(identity)
        sorted((math.ceil(sorted.size * 0.5).toLong - 1).toInt)._1
      }
      val med = disc(vs.map(v => (v._3, v._2)).toSeq)
      val mad = disc(vs.map(v => (math.abs(v._3 - med), v._2)).toSeq)
      assert(r.getAs[Double]("med") == med, s"$t median")
      assert(r.getAs[Double]("mad") == mad, s"$t MAD")
      assert(r.getAs[Long]("n_outliers") ==
        vs.count(v => math.abs(v._3 - med) > 3 * mad).toLong, s"$t outliers")
      assert(r.getAs[Long]("n") == vs.size.toLong)
    }
  }

  test("q176 emits all eight checks with the expected pass pattern") {
    val rows = MiningOps.q176ConstraintAudit(spark, sfDir).collect()
    assert(rows.length === 8)
    val byId = rows.map(r => r.getAs[String]("check_id") ->
      (r.getAs[Long]("violations"), r.getAs[Boolean]("passed"))).toMap
    // keys, completeness, RI, range, domain hold on the fixture
    for (id <- Seq("c1_pk_orders", "c3_complete_text",
        "c4_fd_event_user", "c6_ri_lineitem_orders", "c7_range_discount",
        "c8_domain_status")) {
      assert(byId(id)._1 === 0L, s"$id should have zero violations")
      assert(byId(id)._2, s"$id should pass")
    }
    // two checks are genuinely violated on the fixture — the audit's value
    // is that it FINDS these: the customer->status FD (customers order
    // often), and the (l_orderkey, l_linenumber) composite key (the
    // round-8 generator draws l_linenumber uniformly in 1..7 per line
    // instead of sequentially per order, so orders with >1 line collide)
    for (id <- Seq("c5_fd_cust_status", "c2_ck_lineitem")) {
      assert(byId(id)._1 > 0L, s"$id should be violated on this fixture")
      assert(!byId(id)._2)
    }
    // passed is exactly (violations == 0) on every row
    rows.foreach(r =>
      assert(r.getAs[Boolean]("passed") === (r.getAs[Long]("violations") == 0L)))
  }

  test("q212 chi2 equals a driver-side recomputation over the full contingency grid") {
    val rows = MiningOps.q212Chi2Screen(spark, sfDir).collect()
    assert(rows.length === 4)
    // recompute the customer combo (smallest grid) cell by cell
    val obs = Tables(spark, sfDir, "customer")
      .select(col("c_mktsegment"),
        when(col("c_acctbal") < 0, "neg").otherwise("pos").as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val feats = obs.keySet.map(_._1)
    val targs = obs.keySet.map(_._2)
    val rm = feats.map(f => f -> obs.filter(_._1._1 == f).values.sum).toMap
    val cm = targs.map(t => t -> obs.filter(_._1._2 == t).values.sum).toMap
    val nn = obs.values.sum
    def roundHalfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val chi2Micro = (for (f <- feats; t <- targs) yield {
      val o = obs.getOrElse((f, t), 0L)
      val d = o * nn - rm(f) * cm(t)
      roundHalfUp(1000000.0 * d * d / (rm(f) * cm(t) * nn))
    }).sum
    val r = rows.find(_.getAs[String]("table_name") == "customer").get
    assert(r.getAs[Long]("n") === nn)
    assert(r.getAs[Long]("r") === feats.size.toLong)
    assert(r.getAs[Long]("c") === targs.size.toLong)
    assert(r.getAs[Long]("dof") === (feats.size - 1L) * (targs.size - 1L))
    assert(r.getAs[Long]("chi2_micro") === chi2Micro)
    val vRef = roundHalfUp(1000.0 * math.sqrt(
      chi2Micro / (1000000.0 * nn * math.min(feats.size - 1, targs.size - 1))))
    assert(r.getAs[Long]("v_milli") === vRef)
    // Cramer's V is a [0,1] effect size on every row
    rows.foreach(r => assert(r.getAs[Long]("v_milli") >= 0L &&
      r.getAs[Long]("v_milli") <= 1000L))
  }

  test("q220 clusters: labels are true connected components, points conserve, cells disjoint") {
    val rows = MiningOps.q220DensityCluster(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute dense cells + true CC driver-side (union-find), compare inventories
    val pts = Tables(spark, sfDir, "embeddings")
      .select(expr("CAST(round(element_at(embedding, 1) * 1000000) AS BIGINT)"),
        expr("CAST(round(element_at(embedding, 2) * 1000000) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (minx, maxx) = (pts.map(_._1).min, pts.map(_._1).max)
    val (miny, maxy) = (pts.map(_._2).min, pts.map(_._2).max)
    val g = MiningOps.Q220Grid
    val cellOf = pts.map { case (x, y) =>
      ((x - minx) * (g - 1) / math.max(1, maxx - minx),
        (y - miny) * (g - 1) / math.max(1, maxy - miny))
    }
    val counts = cellOf.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val minPts = math.max(2L, 4L * pts.length / (g * g))
    val dense = counts.filter(_._2 >= minPts).keySet
    // union-find over 8-adjacency
    val parent = scala.collection.mutable.Map(dense.map(c => c -> c).toSeq: _*)
    def find(c: (Long, Long)): (Long, Long) =
      if (parent(c) == c) c else { val r = find(parent(c)); parent(c) = r; r }
    for (a <- dense; dx <- -1 to 1; dy <- -1 to 1) {
      val b = (a._1 + dx, a._2 + dy)
      if (dense(b)) parent(find(a)) = find(b)
    }
    val comps = dense.groupBy(find)
    assert(rows.length === comps.size, "one output row per true connected component")
    val gotInventory = rows.map(r =>
      (r.getAs[Long]("n_cells"), r.getAs[Long]("n_points"))).sorted.toSeq
    val refInventory = comps.values.map(cs =>
      (cs.size.toLong, cs.toSeq.map(counts).sum)).toSeq.sorted
    assert(gotInventory === refInventory, "cluster size inventory must match true CC")
    // conservation: every dense cell's points counted exactly once
    assert(rows.map(_.getAs[Long]("n_points")).sum === dense.toSeq.map(counts).sum)
  }
}
