package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pattern-mining / data-quality profiling surface (SURVEY.md §2b
  * extensions): the classic warehouse-adjacent analyses a curation team
  * runs over the same fact tables the relational queries read.
  *
  * Reference tie-in: the reference validates records one at a time and
  * delegates cross-record rules to the remote app
  * (`lib/batchProcessing.js:620-643`, README.md:312 "duplicate key"
  * errors); these operators are the set-level versions of that checking —
  * co-occurrence structure (q175) and dataset-level constraints (q176) —
  * that only a distributed engine can run over the whole corpus.
  */
object MiningOps {

  /** q175 cap: baskets larger than this are excluded from pair mining.
    * TPC-H-ish orders top out at ~13 distinct parts, so the cap is a
    * no-op on the fixture — it exists because pair fan-out is
    * Σ n_items² per basket, and one pathological 10⁶-item basket (a
    * crawler session, a bot cart) would otherwise dominate the whole
    * job. Same move as the LSH `maxBucket` cap (Dedup.scala).
    */
  val Q175MaxBasket = 32

  /** q175 minimum pair support: Agrawal–Srikant's A-priori frequency
    * floor — the HAVING prunes the hapax-pair long tail before the
    * confidence/lift joins, the same economics as q102's min-count cut.
    */
  val Q175MinSupport = 2

  /** q175 — MARKET-BASKET ASSOCIATION RULES (A-priori level 2): frequent
    * part pairs over order baskets with support, directional confidence,
    * and lift — the "customers who bought X also bought Y" co-occurrence
    * mining (Agrawal & Srikant, VLDB 1994), which is also exactly the
    * token/URL/domain co-occurrence shape a corpus-curation team runs to
    * find correlated sources.
    *
    * Plan shape (scale story):
    *   - baskets = DISTINCT (orderkey, partkey) — one corpus-keyed
    *     exchange; basket sizes reuse the same orderkey grouping;
    *   - the pair join is EQUI on orderkey, self-joining only baskets
    *     that survive the `Q175MaxBasket` cap, so pair work is
    *     Σ n_items² with n_items ≤ 32 — bounded fan-out per basket,
    *     never corpus × corpus;
    *   - item supports are a parts-sized agg broadcast back onto the
    *     pair frame (two lookups); the order count broadcasts as one row.
    *
    * Exactness: support counts are BIGINT; confidence is integral basis
    * points `10000·sup div s_a`; lift is integral milli-units via the
    * chained floor-division identity `x div a div b = x div (a·b)` (both
    * engines truncate toward zero on non-negative operands), keeping
    * every intermediate ≤ 1000·sup·N — within Long at any fixture scale
    * (at petabyte row counts swap the numerator to DECIMAL(38) in both
    * engines; noted, not needed here).
    */
  def q175AssocRules(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val sizes = baskets.groupBy(col("ok"))
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") <= Q175MaxBasket)
    val kept = baskets.join(sizes, "ok")
    val nOrders = kept.agg(countDistinct(col("ok")).as("n_orders"))
    val item = kept.groupBy(col("pk")).agg(count(lit(1)).as("s"))
    val a = kept.select(col("ok"), col("pk").as("pa"))
    val b = kept.select(col("ok"), col("pk").as("pb"))
    val pairs = a.join(b, Seq("ok")).filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= Q175MinSupport)
    pairs
      .join(broadcast(item.select(col("pk").as("pa"), col("s").as("s_a"))), "pa")
      .join(broadcast(item.select(col("pk").as("pb"), col("s").as("s_b"))), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("support"), col("s_a"), col("s_b"),
        expr("10000 * support div s_a").as("conf_bp"),
        expr("1000 * support * n_orders div s_a div s_b").as("lift_milli"))
      .orderBy(col("pa"), col("pb"))
  }

  val q175Sql: String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |sizes AS (
       |  SELECT ok, count(*) AS n_items FROM baskets GROUP BY ok
       |  HAVING count(*) <= $Q175MaxBasket),
       |kept AS (SELECT b.ok, b.pk FROM baskets b JOIN sizes s ON b.ok = s.ok),
       |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM kept),
       |item AS (SELECT pk, CAST(count(*) AS BIGINT) AS s FROM kept GROUP BY pk),
       |pairs AS (
       |  SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS support
       |  FROM kept a JOIN kept b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= $Q175MinSupport)
       |SELECT pa, pb, support, ia.s AS s_a, ib.s AS s_b,
       |  10000 * support // ia.s AS conf_bp,
       |  1000 * support * n_orders // ia.s // ib.s AS lift_milli
       |FROM pairs JOIN item ia ON pairs.pa = ia.pk
       |  JOIN item ib ON pairs.pb = ib.pk CROSS JOIN n
       |ORDER BY pa, pb""".stripMargin

  /** q176 — DATASET-LEVEL CONSTRAINT AUDIT (the Deequ/Great-Expectations
    * shape): a fixed suite of declarative expectations — key uniqueness,
    * composite-key uniqueness, completeness, functional dependencies,
    * referential integrity, value ranges, accepted domains — each
    * evaluated corpus-wide in one aggregate and emitted as an audit row
    * `(check_id, tbl, kind, violations, passed)`. This is the set-level
    * generalization of the reference's per-record validation (P5–P7,
    * `lib/parsers.js:99-110,224-227`): arity/type checks see one record,
    * these see the whole dataset — and the "duplicate key" class the
    * reference delegates to the remote app (README.md:312) becomes the
    * uniqueness checks here.
    *
    * Plan shape: every check is one scan + one (mostly map-side
    * combinable) aggregate producing ONE row; the union is 8 rows. The
    * FD checks aggregate onto lhs-sized keys; referential integrity is a
    * LEFT ANTI join with the parent side broadcastable when it is a
    * dimension. At 100 TB you fuse the same-table checks into one pass
    * (the q99 multi-aggregate move) — kept separate here so each row's
    * plan states its own shape. Violation counts are BIGINT; `passed`
    * records the observed status (an expected-to-fail FD is a
    * deterministic `false` row, not an error).
    */
  def q176ConstraintAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")
    val documents = Tables(spark, dir, "documents")
    val events = Tables(spark, dir, "events")

    def row(id: String, tbl: String, kind: String, viol: DataFrame): DataFrame =
      viol.select(lit(id).as("check_id"), lit(tbl).as("tbl"), lit(kind).as("kind"),
        col("violations").cast("long").as("violations"),
        (col("violations") === 0).as("passed"))

    // c1: primary-key uniqueness — duplicate o_orderkey rows
    val c1 = row("c1_pk_orders", "orders", "unique(o_orderkey)",
      orders.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations")))
    // c2: composite-key uniqueness on the fact
    val c2 = row("c2_ck_lineitem", "lineitem", "unique(l_orderkey,l_linenumber)",
      lineitem.agg((count(lit(1)) -
        countDistinct(col("l_orderkey"), col("l_linenumber"))).as("violations")))
    // c3: completeness — null/empty text docs
    val c3 = row("c3_complete_text", "documents", "notnull(text)",
      documents.agg(count(when(col("text").isNull || length(col("text")) === 0, 1))
        .as("violations")))
    // c4: FD event_id -> user_id (a key determines everything)
    val c4 = row("c4_fd_event_user", "events", "fd(event_id->user_id)",
      events.groupBy(col("event_id"))
        .agg(countDistinct(col("user_id")).as("ndv"))
        .agg(count(when(col("ndv") > 1, 1)).as("violations")))
    // c5: FD o_custkey -> o_orderstatus (expected to FAIL: a customer has
    // many orders in many states — the audit records it, deterministically)
    val c5 = row("c5_fd_cust_status", "orders", "fd(o_custkey->o_orderstatus)",
      orders.groupBy(col("o_custkey"))
        .agg(countDistinct(col("o_orderstatus")).as("ndv"))
        .agg(count(when(col("ndv") > 1, 1)).as("violations")))
    // c6: referential integrity — orphan lineitems (left anti vs parent keys)
    val c6 = row("c6_ri_lineitem_orders", "lineitem", "fk(l_orderkey->orders)",
      lineitem.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations")))
    // c7: range — discount within [0, 0.1] (integer cents avoid float compares)
    val c7 = row("c7_range_discount", "lineitem", "range(l_discount,[0,0.1])",
      lineitem.select((round(col("l_discount") * 100)).cast("long").as("d_pct"))
        .agg(count(when(col("d_pct") < 0 || col("d_pct") > 10, 1)).as("violations")))
    // c8: accepted domain for the status enum
    val c8 = row("c8_domain_status", "orders", "in(o_orderstatus,{F,O,P})",
      orders.agg(count(when(!col("o_orderstatus").isin("F", "O", "P"), 1))
        .as("violations")))

    Seq(c1, c2, c3, c4, c5, c6, c7, c8).reduce(_.union(_))
      .orderBy(col("check_id"))
  }

  val q176Sql: String =
    """SELECT * FROM (
      |SELECT 'c1_pk_orders' AS check_id, 'orders' AS tbl, 'unique(o_orderkey)' AS kind,
      |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
      |  count(*) - count(DISTINCT o_orderkey) = 0 AS passed FROM orders
      |UNION ALL
      |SELECT 'c2_ck_lineitem', 'lineitem', 'unique(l_orderkey,l_linenumber)',
      |  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
      |  count(*) - count(DISTINCT (l_orderkey, l_linenumber)) = 0 FROM lineitem
      |UNION ALL
      |SELECT 'c3_complete_text', 'documents', 'notnull(text)',
      |  CAST(count(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END) AS BIGINT),
      |  count(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END) = 0 FROM documents
      |UNION ALL
      |SELECT 'c4_fd_event_user', 'events', 'fd(event_id->user_id)',
      |  CAST(count(CASE WHEN ndv > 1 THEN 1 END) AS BIGINT),
      |  count(CASE WHEN ndv > 1 THEN 1 END) = 0
      |FROM (SELECT event_id, count(DISTINCT user_id) AS ndv FROM events GROUP BY 1)
      |UNION ALL
      |SELECT 'c5_fd_cust_status', 'orders', 'fd(o_custkey->o_orderstatus)',
      |  CAST(count(CASE WHEN ndv > 1 THEN 1 END) AS BIGINT),
      |  count(CASE WHEN ndv > 1 THEN 1 END) = 0
      |FROM (SELECT o_custkey, count(DISTINCT o_orderstatus) AS ndv FROM orders GROUP BY 1)
      |UNION ALL
      |SELECT 'c6_ri_lineitem_orders', 'lineitem', 'fk(l_orderkey->orders)',
      |  CAST(count(*) AS BIGINT), count(*) = 0
      |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |UNION ALL
      |SELECT 'c7_range_discount', 'lineitem', 'range(l_discount,[0,0.1])',
      |  CAST(count(CASE WHEN d_pct < 0 OR d_pct > 10 THEN 1 END) AS BIGINT),
      |  count(CASE WHEN d_pct < 0 OR d_pct > 10 THEN 1 END) = 0
      |FROM (SELECT CAST(round(l_discount * 100) AS BIGINT) AS d_pct FROM lineitem)
      |UNION ALL
      |SELECT 'c8_domain_status', 'orders', 'in(o_orderstatus,{F,O,P})',
      |  CAST(count(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 END) AS BIGINT),
      |  count(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 END) = 0 FROM orders
      |) ORDER BY check_id""".stripMargin

  /** q185 — SKYLINE / PARETO FRONTIER (Börzsönyi et al. 2001): the parts
    * no other part beats on BOTH objectives (minimize p_size, minimize
    * price), the multi-objective "best offers" query no single ORDER BY
    * can answer. Computed scalably as GRID-COLLAPSE + TINY GLOBAL PASS
    * (the q179 two-phase shape): phase 1 collapses the corpus to one
    * min-price row per x-value — a map-side-combinable aggregate, the
    * only fact-sized work; phase 2 runs the staircase test (keep an
    * x-group iff its best y strictly beats every smaller x's best) as a
    * prefix-min window over ≤ |distinct x| rows; a join-back recovers
    * every tied point. Dominance is ≤/≤ with at least one strict:
    * equal-y at a larger x is dominated (strict < against the prefix
    * min), equal (x, y) ties are mutually non-dominating and all kept.
    * Price crosses engines as integer cents (`CAST(round(p*100) AS
    * BIGINT)`, the q93 idiom). For a continuous x-axis the same plan
    * runs after an x-bucketing — the grid is the scalability, the
    * staircase is the semantics.
    */
  def q185Skyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = Tables(spark, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_cents"))
    val perSize = pts.groupBy(col("p_size"))
      .agg(min(col("price_cents")).as("min_cents"))
    val w = Window.orderBy(col("p_size"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val skySizes = perSize
      .withColumn("prev_min", min(col("min_cents")).over(w))
      .filter(col("prev_min").isNull || col("min_cents") < col("prev_min"))
      .select(col("p_size"), col("min_cents"))
    pts.join(skySizes, "p_size")
      .filter(col("price_cents") === col("min_cents"))
      .select(col("p_partkey"), col("p_size"), col("price_cents"))
      .orderBy(col("p_size"), col("p_partkey"))
  }

  val q185Sql: String =
    """WITH pts AS (
      |  SELECT p_partkey, p_size,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
      |  FROM part),
      |per_size AS (
      |  SELECT p_size, min(price_cents) AS min_cents FROM pts GROUP BY p_size),
      |sky AS (
      |  SELECT p_size, min_cents FROM (
      |    SELECT p_size, min_cents,
      |      min(min_cents) OVER (ORDER BY p_size
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
      |    FROM per_size)
      |  WHERE prev_min IS NULL OR min_cents < prev_min)
      |SELECT p.p_partkey, p.p_size, p.price_cents
      |FROM pts p JOIN sky s ON s.p_size = p.p_size AND p.price_cents = s.min_cents
      |ORDER BY p.p_size, p.p_partkey""".stripMargin

  /** q186 — ROBUST OUTLIER DETECTION by median absolute deviation
    * (Hampel's MAD, the robust-statistics replacement for mean±3σ whose
    * breakdown point a heavy-tailed metric destroys): per event_type,
    * med = median of value, MAD = median of |value − med|, outliers =
    * rows with |value − med| > 3·MAD. Both medians are percentile_disc
    * ELEMENTS (the q153 row_number-at-⌈n/2⌉ idiom) — picked by rank,
    * never interpolated — so every emitted double is a datum, and the
    * per-row |x − med| > 3·MAD comparison is scalar IEEE arithmetic both
    * engines evaluate bit-identically (the project's per-row-scalar
    * exactness doctrine). Two window passes partitioned by event_type +
    * two broadcast-sized joins; nothing global, nothing iterative.
    */
  def q186MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
    def discMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val wv = Window.partitionBy(col("event_type"))
        .orderBy(col(valueCol), col("event_id"))
      val wn = Window.partitionBy(col("event_type"))
      df.withColumn("vrn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("event_type"))
        .agg(max(when(col("vrn") === expr("CAST(ceil(n * 0.5) AS BIGINT)"),
          col(valueCol))).as(out))
    }
    val med = discMedian(e, "value", "med")
    val dev = e.join(med, "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = discMedian(dev.select(col("event_type"), col("event_id"), col("dev")),
      "dev", "mad")
    dev.join(mad, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(when(col("dev") > lit(3) * col("mad"), 1)).as("n_outliers"),
        max(col("dev")).as("max_dev"))
      .orderBy(col("event_type"))
  }

  val q186Sql: String =
    """WITH e AS (SELECT event_type, event_id, value FROM events),
      |med AS (
      |  SELECT event_type,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS med
      |  FROM (
      |    SELECT event_type, value,
      |      row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS vrn,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM e)
      |  GROUP BY event_type),
      |dev AS (
      |  SELECT e.event_type, e.event_id, e.value, m.med, abs(e.value - m.med) AS dev
      |  FROM e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.5) AS BIGINT) THEN dev END) AS mad
      |  FROM (
      |    SELECT event_type, dev,
      |      row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS vrn,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM dev)
      |  GROUP BY event_type)
      |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
      |  max(d.med) AS med, max(a.mad) AS mad,
      |  CAST(count(CASE WHEN d.dev > 3 * a.mad THEN 1 END) AS BIGINT) AS n_outliers,
      |  max(d.dev) AS max_dev
      |FROM dev d JOIN mad a USING (event_type)
      |GROUP BY d.event_type
      |ORDER BY d.event_type""".stripMargin

  /** q201 — BENFORD FIRST-DIGIT AUDIT, the classic fabricated-data /
    * broken-ETL tripwire (Benford 1938; standard in forensic accounting
    * and increasingly in data-quality monitors): naturally-occurring
    * multi-scale amounts put digit d first with probability log10(1+1/d)
    * (~30% of values lead with 1); uniform synthetics, truncation bugs,
    * and unit mix-ups all bend the curve. Audited per digit over TWO
    * amount columns (lineitem extendedprice, orders totalprice) in exact
    * integers: the first digit comes from the decimal STRING of the exact
    * cents value (integer→string is exact in both engines — no float
    * log10 on the data path), shares are integer basis points, and the
    * Benford reference is the only float — log10 of a 9-value rational
    * grid, quantized per digit. The output is the per-digit
    * observed-vs-expected table a monitor thresholds on.
    *
    * Scale: one scan per column, a 9-key aggregate, one one-row broadcast
    * total — the audit is free at any table size.
    */
  def q201BenfordAudit(spark: SparkSession, dir: String): DataFrame = {
    def audit(df: DataFrame, table: String, amount: String): DataFrame = {
      val cents = df.select(
        expr(s"CAST(round($amount * 100) AS BIGINT)").as("cents"))
        .filter(col("cents") > 0)
      val digits = cents
        .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("total"))
      digits.crossJoin(broadcast(tot))
        .select(lit(table).as("table_name"), lit(amount).as("amount_col"),
          col("digit"), col("n"),
          expr("10000 * n div total").as("share_bp"),
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")) * 10000)
            .cast("long").as("benford_bp"))
    }
    val l = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    audit(l, "lineitem", "l_extendedprice")
      .unionByName(audit(o, "orders", "o_totalprice"))
      .orderBy(col("table_name"), col("digit"))
  }

  val q201Sql: String = {
    def block(table: String, amount: String): String =
      s"""SELECT '$table' AS table_name, '$amount' AS amount_col, digit,
         |  CAST(n AS BIGINT) AS n,
         |  CAST(10000 * n // sum(n) OVER () AS BIGINT) AS share_bp,
         |  CAST(round(10000 * log10(1 + 1.0 / digit)) AS BIGINT) AS benford_bp
         |FROM (
         |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
         |    count(*) AS n
         |  FROM (SELECT CAST(round($amount * 100) AS BIGINT) AS cents FROM $table)
         |  WHERE cents > 0 GROUP BY 1)""".stripMargin
    Seq(block("lineitem", "l_extendedprice"), block("orders", "o_totalprice"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, digit")
  }

  /** q203's anonymity threshold and the $2,500 balance generalization band. */
  private[graft] val Q203K = 5
  private[graft] val Q203BandCents = 250000L

  /** q203 — K-ANONYMITY AUDIT (Sweeney 2002), the privacy gate a dataset
    * must pass before export: under the quasi-identifier tuple
    * (nation, market segment, $2,500-banded balance), every customer must
    * be indistinguishable from ≥ k−1 others — an equivalence class of
    * size < k re-identifies its members by linkage. The audit is the
    * histogram OF class sizes (the Q13 double-aggregation shape): per
    * class size, how many classes and customers sit there, flagged risky
    * below [[Q203K]]. Banding is exact integer cents division, so both
    * engines agree on every class. The l-diversity companion rides along:
    * per class the distinct count of the sensitive attribute (balance
    * sign), min'd per size class — a k-anonymous class can still leak if
    * everyone in it shares the sensitive value.
    *
    * Scale: one scan → QI-keyed agg (map-side combinable) → size-keyed
    * re-agg over the classes frame. Nothing is row-pairwise; the classes
    * frame is bounded by the QI-space, not the table.
    */
  def q203KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val classes = c
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr(s"(CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) div $Q203BandCents").as("bal_band"),
        when(col("c_acctbal") < 0, lit(0)).otherwise(lit(1)).as("sensitive"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col("sensitive")).as("l_div"))
    classes.groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        (count(lit(1)) * col("class_size")).as("n_customers"),
        min(col("l_div")).as("min_l_diversity"))
      .select(col("class_size"), col("n_classes"), col("n_customers"),
        (col("class_size") < Q203K).as("risky"), col("min_l_diversity"))
      .orderBy(col("class_size"))
  }

  val q203Sql: String =
    s"""WITH classes AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // $Q203BandCents AS bal_band,
       |    count(*) AS class_size,
       |    count(DISTINCT CASE WHEN c_acctbal < 0 THEN 0 ELSE 1 END) AS l_div
       |  FROM customer GROUP BY 1, 2, 3)
       |SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
       |  CAST(count(*) * class_size AS BIGINT) AS n_customers,
       |  class_size < $Q203K AS risky,
       |  CAST(min(l_div) AS BIGINT) AS min_l_diversity
       |FROM classes GROUP BY class_size ORDER BY class_size""".stripMargin

  /** q207's cell size and L∞ radius in integer micro-degrees (cell ≥
    * radius, so a 3×3 neighbor probe is complete).
    */
  private[graft] val Q207CellE6 = 2000000L
  private[graft] val Q207RadiusE6 = 2000000L

  /** q207 — SPATIAL PROXIMITY JOIN via grid blocking (the geohash-cell
    * shape every spatial engine runs under the hood): deterministic
    * pseudo-locations in integer micro-degrees (md5 of the key, salted
    * per axis — both engines derive identical points), bucketed into
    * [[Q207CellE6]]-sized grid cells; the LEFT side keys on its exact
    * cell while the RIGHT side probes its 3×3 neighborhood, so every
    * pair within the [[Q207RadiusE6]] L∞ radius meets in EXACTLY ONE
    * cell (cell ≥ radius ⇒ neighbors differ by ≤ 1 cell; exact-once
    * because only the right side explodes) — no dedup pass, no
    * all-pairs. The exact distance predicate then refines candidates.
    *
    * Scale: candidate volume is Σ_cell n_left·n_right(3×3) — density-
    * bounded like every blocking join in this engine (LSH buckets,
    * anchor buckets); the join is EQUI on (cx, cy), plan-gated. The
    * oracle does the quadratic all-pairs in DuckDB — affordable at
    * oracle scale, which is exactly why the engine side must not.
    */
  def q207SpatialJoin(spark: SparkSession, dir: String): DataFrame = {
    def h60(salt: String) =
      conv(substring(md5(concat(col("c_custkey").cast("string"), lit(salt))), 1, 15), 16, 10)
        .cast("long")
    val pts = Tables(spark, dir, "customer").select(
        col("c_custkey"),
        (h60(":lat") % 180000000L - 90000000L).as("lat_e6"),
        (h60(":lon") % 360000000L - 180000000L).as("lon_e6"))
      .withColumn("cx", expr(s"(lon_e6 + 180000000) div $Q207CellE6"))
      .withColumn("cy", expr(s"(lat_e6 + 90000000) div $Q207CellE6"))
    val left = pts.select(col("c_custkey").as("a"),
      col("lat_e6").as("lat_a"), col("lon_e6").as("lon_a"),
      col("cx"), col("cy"))
    val probes = pts.select(col("c_custkey").as("b"),
        col("lat_e6").as("lat_b"), col("lon_e6").as("lon_b"),
        explode(array((-1 to 1).map(lit(_)): _*)).as("dx"), col("cx"), col("cy"))
      .select(col("b"), col("lat_b"), col("lon_b"),
        (col("cx") + col("dx")).as("cx"),
        explode(array((-1 to 1).map(lit(_)): _*)).as("dy"), col("cy"))
      .select(col("b"), col("lat_b"), col("lon_b"), col("cx"),
        (col("cy") + col("dy")).as("cy"))
    left.join(probes, Seq("cx", "cy"))
      .filter(col("a") < col("b"))
      .filter(abs(col("lat_a") - col("lat_b")) <= Q207RadiusE6 &&
        abs(col("lon_a") - col("lon_b")) <= Q207RadiusE6)
      .select(col("a"), col("b"),
        greatest(abs(col("lat_a") - col("lat_b")),
          abs(col("lon_a") - col("lon_b"))).as("linf_e6"))
      .orderBy(col("a"), col("b"))
  }

  val q207Sql: String =
    s"""WITH pts AS (
       |  SELECT c_custkey,
       |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':lat'), 1, 15))::BIGINT
       |      % 180000000 - 90000000 AS lat_e6,
       |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':lon'), 1, 15))::BIGINT
       |      % 360000000 - 180000000 AS lon_e6
       |  FROM customer)
       |SELECT a.c_custkey AS a, b.c_custkey AS b,
       |  greatest(abs(a.lat_e6 - b.lat_e6), abs(a.lon_e6 - b.lon_e6)) AS linf_e6
       |FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
       |WHERE abs(a.lat_e6 - b.lat_e6) <= $Q207RadiusE6
       |  AND abs(a.lon_e6 - b.lon_e6) <= $Q207RadiusE6
       |ORDER BY a, b""".stripMargin

  /** q212 — χ² FEATURE SCREENING with Cramér's V (Pearson 1900; Cramér
    * 1946): for each (feature, target) categorical pair, the independence
    * statistic χ² = Σ_cells (O − E)²/E over the FULL r×c contingency grid
    * and its normalized effect size V = sqrt(χ²/(N·min(r−1, c−1))) — the
    * screen a curation team runs to rank which metadata columns actually
    * predict a label before training a filter model (the set-level cousin
    * of q176's FD checks: not "does A determine B" but "how far from
    * independent are they").
    *
    * Exactness: observed counts, margins, and N are BIGINT; each cell's
    * deviation d = O·N − r·c is EXACT integer arithmetic; the only floats
    * are the per-cell `round(1e6·d²/(r·c·N))` — a correctly-rounded IEEE
    * chain over integer-valued operands, identical expression tree in both
    * engines (the file-head doctrine: `+ - * / sqrt` yes, `ln/exp` never) —
    * quantized to integer micro-units BEFORE the cell sum, so the
    * order-insensitive integer sum is what crosses engines, never a float
    * accumulation. Long bounds: r·c·N ≤ N³ — fine through sf1; at larger
    * N swap the quantized numerator to DECIMAL(38) (the q175 remark).
    *
    * Grid completeness: χ² sums over EMPTY cells too (their contribution
    * is r·c/N in micro-units), so the grid is the margins' crossJoin — a
    * documented-tiny frame (feature-cardinality × target-cardinality,
    * ≤ ~25 cells here) left-joined against observed counts.
    *
    * Scale: per pair, ONE fact-sized groupBy(feat, target) — map-side
    * combinable — materialized to a cells-sized localCheckpoint, from
    * which margins, N, and the grid all derive. Without the checkpoint
    * Catalyst plans the obs subtree four times (obs + rowm + colm + n =
    * 4 fact scans per pair, the round-9 verdict's q212 finding); with it
    * each table is scanned exactly once and every derived frame reads
    * ≤ r·c rows (PlanSpec gates the single scan via [[q212Obs]]).
    */
  /** The one fact-sized stage of a q212 screen, exposed for PlanSpec's
    * single-scan gate: exactly one file scan must appear in its plan.
    */
  private[graft] def q212Obs(df: DataFrame, feat: String, target: String): DataFrame =
    df.select(col(feat).cast("string").as("f"), col(target).cast("string").as("t"))
      .groupBy(col("f"), col("t")).agg(count(lit(1)).as("o"))

  def q212Chi2Screen(spark: SparkSession, dir: String): DataFrame = {
    def screen(df: DataFrame, table: String, feat: String, target: String): DataFrame = {
      // cells-sized (≤ r·c rows) — checkpointing here is what caps the
      // whole screen at one fact scan
      val obs = q212Obs(df, feat, target).localCheckpoint()
      val rowm = obs.groupBy(col("f")).agg(sum(col("o")).as("rm"))
      val colm = obs.groupBy(col("t")).agg(sum(col("o")).as("cm"))
      val n = obs.agg(sum(col("o")).as("nn"))
      val grid = rowm.crossJoin(broadcast(colm)).crossJoin(broadcast(n))
        .join(obs, Seq("f", "t"), "left")
        .withColumn("o0", coalesce(col("o"), lit(0L)))
        .withColumn("d", col("o0") * col("nn") - col("rm") * col("cm"))
        .withColumn("micro", expr(
          "CAST(round(1000000.0 * d * d / (rm * cm * nn)) AS BIGINT)"))
      grid.agg(
          max(col("nn")).as("n"),
          countDistinct(col("f")).as("r"),
          countDistinct(col("t")).as("c"),
          sum(col("micro")).as("chi2_micro"))
        .select(lit(table).as("table_name"), lit(feat).as("feat"),
          lit(target).as("target"), col("n"), col("r"), col("c"),
          ((col("r") - 1) * (col("c") - 1)).as("dof"), col("chi2_micro"),
          expr("CAST(round(1000 * sqrt(chi2_micro / (1000000.0 * n * least(r - 1, c - 1)))) AS BIGINT)")
            .as("v_milli"))
    }
    val l = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
      .withColumn("bal_sign", when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("pos")))
    val d = Tables(spark, dir, "documents")
    screen(l, "lineitem", "l_returnflag", "l_linestatus")
      .unionByName(screen(o, "orders", "o_orderpriority", "o_orderstatus"))
      .unionByName(screen(c, "customer", "c_mktsegment", "bal_sign"))
      .unionByName(screen(d, "documents", "lang", "source"))
      .orderBy(col("table_name"), col("feat"))
  }

  val q212Sql: String = {
    def block(from: String, table: String, feat: String, target: String): String =
      s"""SELECT '$table' AS table_name, '$feat' AS feat, '$target' AS target,
         |  n, r, c, (r - 1) * (c - 1) AS dof, chi2_micro,
         |  CAST(round(1000 * sqrt(chi2_micro / (1000000.0 * n * least(r - 1, c - 1)))) AS BIGINT) AS v_milli
         |FROM (
         |  SELECT max(nn) AS n, CAST(count(DISTINCT f) AS BIGINT) AS r,
         |    CAST(count(DISTINCT t) AS BIGINT) AS c,
         |    CAST(sum(micro) AS BIGINT) AS chi2_micro
         |  FROM (
         |    SELECT g.f, g.t, g.rm, g.cm, g.nn,
         |      CAST(round(1000000.0 * d * d / (g.rm * g.cm * g.nn)) AS BIGINT) AS micro
         |    FROM (
         |      SELECT rm.f, cm.t, rm.rm, cm.cm, nn.nn,
         |        coalesce(o.o, 0) * nn.nn - rm.rm * cm.cm AS d
         |      FROM (SELECT f, CAST(sum(o) AS BIGINT) AS rm FROM ($from) GROUP BY f) rm
         |      CROSS JOIN (SELECT t, CAST(sum(o) AS BIGINT) AS cm FROM ($from) GROUP BY t) cm
         |      CROSS JOIN (SELECT CAST(sum(o) AS BIGINT) AS nn FROM ($from)) nn
         |      LEFT JOIN ($from) o ON o.f = rm.f AND o.t = cm.t) g))""".stripMargin
    def obs(table: String, feat: String, target: String): String =
      s"SELECT CAST($feat AS VARCHAR) AS f, CAST($target AS VARCHAR) AS t, CAST(count(*) AS BIGINT) AS o FROM $table GROUP BY 1, 2"
    Seq(
      block(obs("lineitem", "l_returnflag", "l_linestatus"),
        "lineitem", "l_returnflag", "l_linestatus"),
      block(obs("orders", "o_orderpriority", "o_orderstatus"),
        "orders", "o_orderpriority", "o_orderstatus"),
      block(obs("(SELECT *, CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign FROM customer)",
        "c_mktsegment", "bal_sign"), "customer", "c_mktsegment", "bal_sign"),
      block(obs("documents", "lang", "source"), "documents", "lang", "source"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, feat")
  }

  /** q220's grid resolution per axis and label-propagation round count. */
  private[graft] val Q220Grid = 16
  private[graft] val Q220Rounds = 8

  /** q220 — GRID-DENSITY CLUSTERING (the GriDBSCAN / STING family: DBSCAN's
    * density semantics on a grid): quantize the first two embedding
    * dimensions onto a data-derived [[Q220Grid]]² grid, mark CORE cells
    * whose count is ≥ 4× the average cell density (DBSCAN's minPts as a
    * scale-free RELATIVE threshold — the absolute count rises with the
    * corpus, the definition doesn't), and merge 8-adjacent core cells into
    * clusters by min-label propagation. The output is the cluster
    * inventory a curation team reads as "how many embedding-space modes
    * does this corpus have, and how big is each" — the density view of the
    * structure q98's SemDeDup exploits via labels.
    *
    * Exactness: coordinates quantize to integer micro-units
    * (float→double→×1e6→round is one correctly-rounded chain both engines
    * share), grid assignment is integral multiply-divide over data-derived
    * broadcast bounds (the q107 normalize idiom). Label propagation runs a
    * FIXED [[Q220Rounds]] rounds in both engines — and a hard require()
    * proves one more round changes nothing, so the fixed-round semantics
    * equal true connected components on this data (the q79 prove-don't-
    * assume idiom).
    *
    * Scale: one corpus scan → ≤ Grid² cell aggregate — that aggregate is
    * the ONLY distributed work. The dense-cell frame is ≤ [[Q220Grid]]²
    * = 256 rows BY CONSTRUCTION (corpus-size-INDEPENDENT), so the
    * propagation rounds run on the driver over collected arrays — the
    * bounded-by-construction case where driver-side is the *right* plan
    * (the q55 greedy-loop precedent, Similarity.scala): the distributed
    * alternative was 8 rounds × 2 joins × a localCheckpoint each ≈ 17
    * scheduler actions over 256 rows, pure driver-loop constant factor
    * (round-9 bench: 61 s median, repeats 8–117 s under contention; this
    * shape: one job). At 100 TB only the one scan grows; the driver work
    * is a fixed ~256·9·8 integer ops regardless of corpus.
    */
  def q220DensityCluster(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("CAST(round(element_at(embedding, 1) * 1000000) AS BIGINT)").as("xq"),
        expr("CAST(round(element_at(embedding, 2) * 1000000) AS BIGINT)").as("yq"))
    val b = pts.agg(
      min(col("xq")).as("minx"), max(col("xq")).as("maxx"),
      min(col("yq")).as("miny"), max(col("yq")).as("maxy"),
      count(lit(1)).as("n"))
    val cells = pts.crossJoin(broadcast(b))
      .select(
        expr(s"(xq - minx) * ${Q220Grid - 1} div greatest(1, maxx - minx)").as("cx"),
        expr(s"(yq - miny) * ${Q220Grid - 1} div greatest(1, maxy - miny)").as("cy"),
        expr(s"greatest(2, 4 * n div ${Q220Grid * Q220Grid})").as("minpts"))
      .groupBy(col("cx"), col("cy"), col("minpts"))
      .agg(count(lit(1)).as("cn"))
    // ≤ Grid² rows by construction — the one collect, after the one scan
    val dense: Map[(Long, Long), Long] = cells.filter(col("cn") >= col("minpts"))
      .select(col("cx"), col("cy"), col("cn"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // one round = neighborhood-min over CURRENT labels THEN pointer jump
    // (label := the post-min label of the cell the label names — labels
    // are cell ids, so the lookup always resolves). Reading CURRENT labels
    // each round (not the initial frame) is what keeps propagation moving
    // past one hop; the jump makes convergence O(log diameter), so
    // [[Q220Rounds]] covers any component a [[Q220Grid]]² grid can hold.
    // EXACTLY the oracle SQL's round, cell for cell.
    def step(cur: Map[(Long, Long), Long]): Map[(Long, Long), Long] = {
      val mins = cur.map { case (c @ (cx, cy), l) =>
        val nbrMin = (for {
          dx <- -1L to 1L; dy <- -1L to 1L
          nl <- cur.get((cx + dx, cy + dy))
        } yield nl).min
        c -> math.min(l, nbrMin)
      }
      val byId = mins.map { case ((cx, cy), l) => (cx * Q220Grid + cy) -> l }
      mins.map { case (c, l) => c -> byId(l) }
    }
    val start = dense.map { case (c @ (cx, cy), _) => c -> (cx * Q220Grid + cy) }
    val converged = (1 to Q220Rounds).foldLeft(start)((cur, _) => step(cur))
    // prove convergence: one more round must be a fixpoint, so the
    // fixed-round labels ARE the connected components of this grid
    require(step(converged) == converged,
      s"q220: dense-cell graph did not converge in $Q220Rounds rounds")
    val out = converged.groupBy(_._2).toSeq.map { case (label, cs) =>
      val ks = cs.keys.toSeq
      (label, ks.size.toLong, ks.map(dense).sum,
        ks.map(_._1).min, ks.map(_._1).max, ks.map(_._2).min, ks.map(_._2).max)
    }.sortBy(_._1)
    import spark.implicits._
    out.toDF("label", "n_cells", "n_points",
      "min_cx", "max_cx", "min_cy", "max_cy")
  }

  val q220Sql: String = {
    // one round = neighborhood-min over CURRENT labels, then pointer jump
    def step(from: String, to: String): String =
      s"""${to}m AS MATERIALIZED (
         |  SELECT c.cx, c.cy, c.cn,
         |    least(min(c.label), min(p.nbr_label)) AS label
         |  FROM $from c JOIN (
         |    SELECT d.cx + dx.x AS cx, d.cy + dy.y AS cy, d.label AS nbr_label
         |    FROM $from d, (VALUES (-1), (0), (1)) dx(x), (VALUES (-1), (0), (1)) dy(y)) p
         |    ON p.cx = c.cx AND p.cy = c.cy
         |  GROUP BY c.cx, c.cy, c.cn),
         |$to AS MATERIALIZED (
         |  SELECT m.cx, m.cy, m.cn, j.label AS label
         |  FROM ${to}m m JOIN ${to}m j
         |    ON m.label = j.cx * $Q220Grid + j.cy)""".stripMargin
    s"""WITH pts AS (
       |  SELECT vec_id,
       |    CAST(round(embedding[1] * 1000000) AS BIGINT) AS xq,
       |    CAST(round(embedding[2] * 1000000) AS BIGINT) AS yq
       |  FROM embeddings),
       |b AS (
       |  SELECT min(xq) AS minx, max(xq) AS maxx, min(yq) AS miny,
       |    max(yq) AS maxy, count(*) AS n
       |  FROM pts),
       |cells AS (
       |  SELECT (xq - minx) * ${Q220Grid - 1} // greatest(1, maxx - minx) AS cx,
       |    (yq - miny) * ${Q220Grid - 1} // greatest(1, maxy - miny) AS cy,
       |    greatest(2, 4 * n // ${Q220Grid * Q220Grid}) AS minpts,
       |    count(*) AS cn
       |  FROM pts, b GROUP BY 1, 2, 3),
       |dense AS MATERIALIZED (
       |  SELECT cx, cy, CAST(cn AS BIGINT) AS cn, cx * $Q220Grid + cy AS label
       |  FROM cells WHERE cn >= minpts),
       |${(1 to Q220Rounds).map(i => step(if (i == 1) "dense" else s"l${i - 1}", s"l$i"))
          .mkString(",\n")}
       |SELECT label, CAST(count(*) AS BIGINT) AS n_cells,
       |  CAST(sum(cn) AS BIGINT) AS n_points,
       |  min(cx) AS min_cx, max(cx) AS max_cx,
       |  min(cy) AS min_cy, max(cy) AS max_cy
       |FROM l$Q220Rounds GROUP BY label ORDER BY label""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q220_density_cluster" -> q220DensityCluster _,
    "q212_chi2_screen" -> q212Chi2Screen _,
    "q207_spatial_join" -> q207SpatialJoin _,
    "q203_k_anonymity" -> q203KAnonymity _,
    "q201_benford_audit" -> q201BenfordAudit _,
    "q185_skyline" -> q185Skyline _,
    "q186_mad_outliers" -> q186MadOutliers _,
    "q175_assoc_rules" -> q175AssocRules _,
    "q176_constraint_audit" -> q176ConstraintAudit _)

  val oracles: Map[String, String] = Map(
    "q220_density_cluster" -> q220Sql,
    "q212_chi2_screen" -> q212Sql,
    "q207_spatial_join" -> q207Sql,
    "q203_k_anonymity" -> q203Sql,
    "q201_benford_audit" -> q201Sql,
    "q185_skyline" -> q185Sql,
    "q186_mad_outliers" -> q186Sql,
    "q175_assoc_rules" -> q175Sql,
    "q176_constraint_audit" -> q176Sql)
}
