package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Classic TPC-H query shapes adapted to the synthetic schema — the
  * recognizable multi-join benchmark plans (Q3 shipping priority, Q5 local
  * supplier volume, Q10 returned items), each a different join-ordering /
  * broadcast-selection stress on Catalyst.
  */
object TpchStyle {

  /** Q3: top unshipped-revenue orders for one market segment. Catalyst
    * pushes both date filters to the scans; customer joins broadcast.
    */
  def q90TpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"),
        (unix_micros(col("o_orderdate").cast("timestamp")) / 1000000L).cast("long").as("orderdate_epoch"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  val q90Sql: String =
    """SELECT l_orderkey,
      |  epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 1000000 AS orderdate_epoch,
      |  o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin

  /** Q5-style: revenue per nation where customer and supplier share the
    * nation — the 6-table join with a cycle-closing predicate.
    */
  def q91TpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val l = Tables(spark, dir, "lineitem")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q91Sql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Q10-style: returned-item revenue per customer with nation attached. */
  def q92TpchQ10(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val n = Tables(spark, dir, "nation")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q92Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q18-style (large-volume customer): orders whose total lineitem
    * quantity clears a threshold, joined back to orders + customer. The
    * shape stresses aggregate-then-join ordering: the quantity rollup runs
    * FIRST (one shuffle on l_orderkey), the HAVING filter collapses it to a
    * handful of hot orders, and only those survivors join — at 100 TB the
    * pre-aggregation is the difference between joining a handful of rows
    * and joining the whole lineitem table.
    *
    * Quantities compare in integer cents (sum of per-row
    * `CAST(round(q*100) AS BIGINT)`) so the HAVING boundary cannot drift
    * between engines on float summation order.
    */
  def q93TpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val big = l.groupBy(col("l_orderkey"))
      .agg(sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_cents"))
      .filter(col("qty_cents") > 20000L)
    big.join(o, big("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        (unix_micros(col("o_orderdate").cast("timestamp")) / 1000000L).cast("long").as("orderdate_epoch"),
        col("o_totalprice"), col("qty_cents"))
      .orderBy(col("qty_cents").desc, col("o_orderkey"))
      .limit(20)
  }

  val q93Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey, CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
      |  FROM lineitem GROUP BY l_orderkey HAVING qty_cents > 20000)
      |SELECT c_name, c_custkey, o_orderkey,
      |  epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 1000000 AS orderdate_epoch,
      |  o_totalprice, qty_cents
      |FROM big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY qty_cents DESC, o_orderkey LIMIT 20""".stripMargin

  /** Q22-style (global sales opportunity): positive-balance customers above
    * the average balance with NO urgent-priority order, rolled up per
    * nation. Two classic sub-plans in one query: a one-row scalar subquery
    * (the average) distributed as a broadcast cross join, and a left-anti
    * join against a filtered fact table. Balances compare in integer cents
    * — the average is `sum(cents) div count`, so the threshold is the same
    * BIGINT in both engines regardless of summation order.
    */
  def q94TpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .withColumn("cc", expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
    val n = Tables(spark, dir, "nation")
    // scalar subquery as a broadcast one-row frame: every executor gets the
    // threshold without a driver round-trip
    val thr = c.filter(col("cc") > 0L)
      .agg(expr("CAST(sum(cc) AS BIGINT) div count(*)").as("thr"))
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.crossJoin(broadcast(thr))
      .filter(col("cc") > col("thr"))
      .join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"), sum(col("cc")).as("totacctbal_cents"))
      .orderBy(col("n_name"))
  }

  val q94Sql: String =
    """WITH c AS (
      |  SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS cc FROM customer),
      |t AS (SELECT CAST(sum(cc) AS BIGINT) // count(*) AS thr FROM c WHERE cc > 0)
      |SELECT n_name,
      |  CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(cc) AS BIGINT) AS totacctbal_cents
      |FROM c, t
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE cc > thr AND NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Q7-style (volume shipping): revenue flowing between one unordered pair
    * of nations per ship year — supplier nation on the lineitem side,
    * customer nation on the order side, both directions of the pair kept as
    * separate groups. The classic two-dimension join stress: the SAME
    * broadcast nation table joins twice under different roles, and the pair
    * predicate must apply AFTER both roles resolve.
    *
    * The pair is DERIVED FROM THE DATA — the highest-traffic cross-nation
    * pair in the date window (ties broken by name) — so the query is
    * non-empty at every fixture scale; a hardcoded pair is unsatisfiable on
    * the 10-supplier sf0.001 fixture. The fact scans ONCE and the whole
    * query is ONE pipelined job: the first rollup groups to (supp, cust,
    * year) — a nations²·years-sized frame — and the pair derivation is two
    * WINDOW passes over that tiny aggregate (pair totals, then a global
    * rank), never a persist/self-join split. (The previous shape persisted
    * the aggregate and joined it against its own grouped argmax — an
    * InMemoryRelation boundary that broke one job into three sequential
    * ones AND leaked the persisted frame into the session cache; measured
    * 3.6 s quiet vs 0.9 s for this window form at sf0.1.)
    *
    * Revenue sums in integer cents (per-row `round(price·(1−disc)·100)`
    * BIGINT) so no float summation order can drift between engines —
    * tighter than Q3/Q5's round-at-the-end idiom. Headroom: 2⁶³ cents
    * ≈ 9·10¹⁶ dollars — safe at any corpus size.
    */
  def q124TpchQ7(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val sn = n.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = n.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val agg = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(sn), s("s_nationkey") === col("sn_key"))
      .join(broadcast(cn), c("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("revenue_cents"),
        count(lit(1)).as("cnt"))
    // pair selection over the ≤ nations²·years aggregate: pair totals via a
    // (na, nb) window, winner via a global dense_rank — all rows of the
    // winning unordered pair share one (pair_cnt, na, nb), so rank 1 IS the
    // orderBy-limit-1 semantics including its tie break. The single-
    // partition window exchange carries a nations²·years frame — pennies.
    import org.apache.spark.sql.expressions.Window
    agg
      .withColumn("na", least(col("supp_nation"), col("cust_nation")))
      .withColumn("nb", greatest(col("supp_nation"), col("cust_nation")))
      .withColumn("pair_cnt", sum(col("cnt")).over(Window.partitionBy(col("na"), col("nb"))))
      .withColumn("rk", dense_rank().over(
        Window.orderBy(col("pair_cnt").desc, col("na"), col("nb"))))
      .filter(col("rk") === 1)
      .select(col("supp_nation"), col("cust_nation"), col("l_year"), col("revenue_cents"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q124Sql: String =
    """WITH agg AS (
      |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |    year(l_shipdate) AS l_year,
      |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |    count(*) AS cnt
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND sn.n_name <> cn.n_name
      |  GROUP BY 1, 2, 3),
      |pair AS (
      |  SELECT least(supp_nation, cust_nation) AS na, greatest(supp_nation, cust_nation) AS nb
      |  FROM agg GROUP BY 1, 2 ORDER BY sum(cnt) DESC, na, nb LIMIT 1)
      |SELECT supp_nation, cust_nation, l_year, revenue_cents
      |FROM agg, pair
      |WHERE (supp_nation = na AND cust_nation = nb)
      |   OR (supp_nation = nb AND cust_nation = na)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q14-style (promotion effect): per ship month, the share of revenue on
    * PROMO-type parts in basis points. The part join is the selective
    * dimension broadcast; the monthly rollup is one shuffle on a
    * dates-sized key space.
    *
    * The ratio is fully integral: both revenue legs sum as BIGINT cents
    * and the share is emitted as integer basis points
    * (`promo·10⁴ div total`) — no float op anywhere, so no
    * engine-dependent rounding can drift the hash. Headroom: 10⁴ · promo
    * cents stays under 2⁶³ up to ~9·10¹² dollars of monthly promo revenue.
    */
  def q125TpchQ14(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .withColumn("rev_cents", expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("ym"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_cents")).otherwise(0L)).as("promo_cents"),
        sum(col("rev_cents")).as("total_cents"))
      .withColumn("promo_bp", expr("promo_cents * 10000 div total_cents"))
      .orderBy(col("ym"))
  }

  val q125Sql: String =
    """SELECT ym, promo_cents, total_cents,
      |  promo_cents * 10000 // total_cents AS promo_bp
      |FROM (
      |  SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
      |    CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
      |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1)
      |ORDER BY ym""".stripMargin

  /** Register the TPC-H tables as temp views so q126–q128 can be written as
    * LITERAL correlated-subquery SQL — the point of these three rows is that
    * Catalyst's decorrelation (RewriteCorrelatedScalarSubquery /
    * RewritePredicateSubquery) turns the per-row subplans into
    * aggregate+join, which PlanSpec gates. View names are prefixed to stay
    * out of any user namespace.
    */
  private def tpchViews(spark: SparkSession, dir: String): Unit =
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region").foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(s"graft_tpch_$t")
    }

  /** Q17-style (small-quantity-order revenue): lineitems whose quantity is
    * below a fifth of their part's average order quantity, for one brand.
    * Written as the classic CORRELATED SCALAR AGGREGATE subquery — Catalyst
    * decorrelates it into a per-part aggregate joined back to the fact
    * (PlanSpec asserts no scalar-subquery survives optimization); a naive
    * per-row subplan would re-scan lineitem once per row and can never run
    * at 100 TB.
    *
    * Integral throughout: quantities in BIGINT cents and the threshold is
    * `sum div (5·count)` — integer floor identical in both engines, so the
    * predicate boundary cannot drift on float division.
    */
  def q126TpchQ17(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
        |  CAST(count(*) AS BIGINT) AS small_lines
        |FROM graft_tpch_lineitem l
        |JOIN graft_tpch_part p ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#13'
        |  AND CAST(round(l.l_quantity * 100) AS BIGINT) <
        |    (SELECT sum(CAST(round(l2.l_quantity * 100) AS BIGINT)) div (5 * count(*))
        |     FROM graft_tpch_lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
  }

  val q126Sql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
      |  CAST(count(*) AS BIGINT) AS small_lines
      |FROM lineitem l
      |JOIN part p ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#13'
      |  AND CAST(round(l.l_quantity * 100) AS BIGINT) <
      |    (SELECT sum(CAST(round(l2.l_quantity * 100) AS BIGINT)) // (5 * count(*))
      |     FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** Q21-style (suppliers who kept orders waiting): on finished orders,
    * suppliers whose lineitem came back returned while NO other supplier on
    * the same order had a return — EXISTS and NOT EXISTS correlated against
    * the SAME fact table, the canonical semi-join + anti-join decorrelation
    * pair. (The original's commit/receipt-date lag is restated on
    * l_returnflag — the fixture has no receipt dates.) Catalyst rewrites
    * both subqueries into one semi and one anti hash join on l_orderkey;
    * PlanSpec gates that no per-row subplan survives.
    */
  def q127TpchQ21(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM graft_tpch_supplier s
        |JOIN graft_tpch_lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN graft_tpch_orders o ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM graft_tpch_lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM graft_tpch_lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
  }

  val q127Sql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders o ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** Q4-style (order priority checking): orders of one year with at least
    * one returned lineitem, counted per priority — the plain EXISTS
    * decorrelation (one semi join, no agg in the subquery). The original's
    * commit-before-receipt predicate is restated on l_returnflag. */
  def q128TpchQ4(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM graft_tpch_orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM graft_tpch_lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val q128Sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q20-style (excess-inventory suppliers): suppliers who shipped more
    * than 75% of some contested part's total 1996 volume — a nested
    * decorrelation stress one level past q126: an IN subquery whose
    * HAVING holds TWO correlated scalar aggregate subqueries (the part's
    * total volume and its distinct-supplier count) over the same filtered
    * fact. Catalyst must decorrelate all three levels into aggregates +
    * joins; any surviving per-row subplan re-scans lineitem per group.
    * (The original's part-name LIKE + availqty predicate is restated on
    * the shipped-volume share — the fixture has no partsupp table.)
    * Integral throughout: quantities in BIGINT cents, share test is
    * `4·supplier_sum > 3·part_sum` — no division anywhere.
    */
  def q131TpchQ20(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH lf AS (
        |  SELECT l_suppkey, l_partkey, CAST(round(l_quantity * 100) AS BIGINT) AS qc
        |  FROM graft_tpch_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01')
        |SELECT s_suppkey, s_name
        |FROM graft_tpch_supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lf l1
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING 4 * sum(qc) > 3 * (SELECT sum(qc) FROM lf l2 WHERE l2.l_partkey = l1.l_partkey)
        |     AND (SELECT count(DISTINCT l_suppkey) FROM lf l3 WHERE l3.l_partkey = l1.l_partkey) >= 2)
        |ORDER BY s_suppkey""".stripMargin)
  }

  val q131Sql: String =
    """WITH lf AS (
      |  SELECT l_suppkey, l_partkey, CAST(round(l_quantity * 100) AS BIGINT) AS qc
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01')
      |SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lf l1
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING 4 * sum(qc) > 3 * (SELECT sum(qc) FROM lf l2 WHERE l2.l_partkey = l1.l_partkey)
      |     AND (SELECT count(DISTINCT l_suppkey) FROM lf l3 WHERE l3.l_partkey = l1.l_partkey) >= 2)
      |ORDER BY s_suppkey""".stripMargin

  /** Q15-style (top supplier): per-supplier revenue over one quarter in a
    * derived view consumed TWICE — once grouped, once inside the scalar
    * `= (SELECT max(...))` subquery. The classic view-vs-its-own-max
    * shape: Catalyst plans the subquery as an uncorrelated one-row
    * aggregate (a broadcast, not a per-row rescan) and AQE reuses the
    * exchange under both consumers. Revenue is exact-integral micro-units
    * — cents × (10000 − discount basis points) — so the max and the
    * equality cannot drift on float summation order across engines.
    */
  def q138TpchQ15(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS BIGINT)
        |      AS rev_micro
        |  FROM graft_tpch_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, rev_micro
        |FROM graft_tpch_supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE rev_micro = (SELECT max(rev_micro) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)
  }

  val q138Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |             (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS BIGINT)
      |      AS rev_micro
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, rev_micro
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE rev_micro = (SELECT max(rev_micro) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q11-style (important stock): parts whose revenue exceeds 1.5× the
    * MEAN part revenue — a grouped HAVING tested against TWO uncorrelated
    * scalar subqueries (global revenue sum, global part count). (The
    * original runs on partsupp value with a fixed fraction; the fixture
    * has no partsupp, and a fixed share threshold empties as the part
    * count grows, so the threshold is data-derived — scale-invariant by
    * construction.) The share predicate is pure integer
    * cross-multiplication (`2·part_sum·n_parts > 3·total`) — no division
    * — and Catalyst must plan both global aggregates as broadcast
    * one-row subplans feeding every group's HAVING, never per-group
    * rescans.
    */
  def q139TpchQ11(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH lv AS (
        |  SELECT l_partkey,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS rc
        |  FROM graft_tpch_lineitem)
        |SELECT l_partkey, CAST(sum(rc) AS BIGINT) AS part_rev_cents
        |FROM lv
        |GROUP BY l_partkey
        |HAVING 2 * CAST(sum(rc) AS BIGINT) *
        |    (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lv) >
        |  3 * (SELECT CAST(sum(rc) AS BIGINT) FROM lv)
        |ORDER BY part_rev_cents DESC, l_partkey""".stripMargin)
  }

  val q139Sql: String =
    """WITH lv AS (
      |  SELECT l_partkey,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS rc
      |  FROM lineitem)
      |SELECT l_partkey, CAST(sum(rc) AS BIGINT) AS part_rev_cents
      |FROM lv
      |GROUP BY l_partkey
      |HAVING 2 * CAST(sum(rc) AS BIGINT) *
      |    (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lv) >
      |  3 * (SELECT CAST(sum(rc) AS BIGINT) FROM lv)
      |ORDER BY part_rev_cents DESC, l_partkey""".stripMargin

  /** Q13-style (customer order distribution): the histogram-of-counts
    * double aggregation over a LEFT OUTER join — zero-order customers MUST
    * survive into the c_count = 0 bucket, which an inner join silently
    * drops (the classic Q13 trap). The exclusion predicate lives in the
    * JOIN CONDITION, not a WHERE (a WHERE would turn the outer join
    * inner); the fixture lacks o_comment so the excluded class is urgent
    * orders. Both aggregations key on bounded domains (customers, then
    * distinct counts) — no wide rows, no skew.
    */
  def q146TpchQ13(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    c.join(o,
        c("c_custkey") === o("o_custkey") && o("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q146Sql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q19-style (discounted revenue, disjunctive predicates): the OR-of-ANDs
    * over brand × size × quantity ranges that stresses disjunctive
    * predicate handling — the filter references BOTH tables, so it can only
    * apply above the join; the join itself must still broadcast the dim.
    * Revenue in exact integral micro-units (cents × basis points).
    */
  def q147TpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    def clause(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) && col("l_quantity").between(qLo, qHi)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .filter(clause("Brand#1", 1, 15, 1, 20) ||
        clause("Brand#2", 10, 30, 5, 30) ||
        clause("Brand#3", 20, 50, 10, 40))
      .agg(
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(10000 - CAST(round(l_discount * 10000) AS BIGINT))")).as("revenue_micro"),
        count(lit(1)).as("n_lines"))
  }

  val q147Sql: String =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |           (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS BIGINT)
      |    AS revenue_micro,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 5 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 10 AND 40)""".stripMargin

  /** Q8-style (national market share): per order-year, every supplier
    * nation's share of ASIA-customer PROMO-part revenue — the 8-table join
    * with nation in TWO roles (customer's, aliased apart from supplier's).
    * Emitting ALL nations' shares (the original picks one) keeps the row
    * set non-empty at every fixture scale — the q124 lesson. Share is
    * integral basis points via `vol div (year_total div 10000)` — dividing
    * the DENOMINATOR first keeps every intermediate under 2^63 no matter
    * the corpus (numerator·10⁴ would overflow first at ~10¹⁵ micro-units).
    */
  def q148TpchQ8(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = Tables(spark, dir, "customer")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val custNation = n.select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
    val suppNation = n.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val r = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val p = Tables(spark, dir, "part").filter(col("p_type") === "PROMO")
    val vol = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(custNation), c("c_nationkey") === col("cn_key"))
      .join(broadcast(r), col("cn_region") === col("r_regionkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(suppNation), s("s_nationkey") === col("sn_key"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"), col("supp_nation"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "(10000 - CAST(round(l_discount * 10000) AS BIGINT))").as("vol"))
      .groupBy(col("o_year"), col("supp_nation"))
      .agg(sum(col("vol")).as("nation_vol_micro"))
    vol.withColumn("year_vol_micro",
        sum(col("nation_vol_micro")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("o_year"))))
      .select(col("o_year"), col("supp_nation"), col("nation_vol_micro"),
        expr("nation_vol_micro div (year_vol_micro div 10000)").as("share_bp"))
      .orderBy(col("o_year"), col("supp_nation"))
  }

  val q148Sql: String =
    """WITH vol AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    sn.n_name AS supp_nation,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |             (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS BIGINT)
      |      AS nation_vol_micro
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1, 2)
      |SELECT o_year, supp_nation, nation_vol_micro,
      |  CAST(nation_vol_micro //
      |    (sum(nation_vol_micro) OVER (PARTITION BY o_year) // 10000) AS BIGINT)
      |    AS share_bp
      |FROM vol
      |ORDER BY o_year, supp_nation""".stripMargin

  /** Q6-style (forecast revenue change): the canonical pure scan-filter-agg
    * — every predicate (date range, discount band, quantity cap) must reach
    * the parquet scan as a pushed filter (PlanSpec-gated); at 100 TB this
    * query IS its scan, and row-group statistics prune most of it.
    */
  def q149TpchQ6(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "CAST(round(l_discount * 10000) AS BIGINT)")).as("revenue_micro"),
        count(lit(1)).as("n_lines"))

  val q149Sql: String =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |           CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT)
      |    AS revenue_micro,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** The fixture ships no `partsupp` table, so it is DERIVED — exactly, in
    * both engines: the key set is the distinct (l_partkey, l_suppkey) pairs
    * that actually traded, and the two measures are md5-hash functions of
    * the key (the q84 split idiom): ps_supplycost_cents = 100 + h60(pk:sk)
    * % 90000, ps_availqty = 1 + h60("a:"+pk:sk) % 9999. Any job — Spark or
    * the DuckDB oracle — recomputes the identical table from lineitem
    * alone, which is what unblocks TPC-H Q2/Q9/Q16 with no fixture change.
    * At 100 TB the derivation is one distinct over a two-column projection
    * (shuffle on the pair key) — partsupp-sized, not lineitem-sized.
    */
  private def partsupp(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ColFns.h60
    val key = concat(col("ps_partkey").cast("string"), lit(":"), col("ps_suppkey").cast("string"))
    Tables(spark, dir, "lineitem")
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_supplycost_cents", lit(100L) + h60(key) % 90000L)
      .withColumn("ps_availqty", lit(1L) + h60(concat(lit("a:"), key)) % 9999L)
  }

  /** The oracle-side derivation — MUST stay in lockstep with [[partsupp]]. */
  private val partsuppSql: String =
    """partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    100 + ('0x' || substr(md5(CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR)), 1, 15))::BIGINT % 90000 AS ps_supplycost_cents,
      |    1 + ('0x' || substr(md5('a:' || CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR)), 1, 15))::BIGINT % 9999 AS ps_availqty
      |  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem))""".stripMargin

  /** Q2-style (minimum-cost supplier): for large parts of one type, the
    * ASIA supplier whose supply cost is the part's regional minimum — the
    * classic correlated scalar-MIN subquery over the SAME four-table join
    * as the outer query. Catalyst decorrelates it into a per-part min
    * aggregate joined back (PlanSpec-gated: no per-part rescans survive);
    * the supplier/nation/region dims broadcast on both legs. Ordered by
    * the unique (s_acctbal desc, p_partkey, s_name) so the LIMIT boundary
    * cannot drift when two suppliers tie on a hash-derived cost.
    */
  def q157TpchQ2(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    partsupp(spark, dir).createOrReplaceTempView("graft_tpch_partsupp")
    spark.sql(
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost_cents
        |FROM graft_tpch_partsupp
        |JOIN graft_tpch_part ON p_partkey = ps_partkey
        |JOIN graft_tpch_supplier ON s_suppkey = ps_suppkey
        |JOIN graft_tpch_nation ON s_nationkey = n_nationkey
        |JOIN graft_tpch_region ON n_regionkey = r_regionkey
        |WHERE p_size >= 40 AND p_type = 'LARGE' AND r_name = 'ASIA'
        |  AND ps_supplycost_cents = (
        |    SELECT min(ps2.ps_supplycost_cents)
        |    FROM graft_tpch_partsupp ps2
        |    JOIN graft_tpch_supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        |    JOIN graft_tpch_nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN graft_tpch_region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
        |ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100""".stripMargin)
  }

  val q157Sql: String =
    s"""WITH $partsuppSql
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost_cents
       |FROM partsupp
       |JOIN part ON p_partkey = ps_partkey
       |JOIN supplier ON s_suppkey = ps_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE p_size >= 40 AND p_type = 'LARGE' AND r_name = 'ASIA'
       |  AND ps_supplycost_cents = (
       |    SELECT min(ps2.ps_supplycost_cents)
       |    FROM partsupp ps2
       |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
       |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
       |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
       |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
       |ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100""".stripMargin

  /** Q9-style (product-type profit): per supplier nation × order year, the
    * profit on widget parts — revenue minus supply cost × quantity, the
    * one TPC-H shape where the FACT joins partsupp on the COMPOSITE
    * (partkey, suppkey) key. Join order matters at 100 TB: part filters
    * first and broadcasts (it gates the fact early), supplier/nation
    * broadcast, and only the two fact-sized joins — orders on orderkey,
    * partsupp on the pair key — shuffle (PlanSpec-gated). Profit is exact
    * integral micro-units (10⁻⁴ $): round(rev·100)·100 −
    * ps_supplycost_cents · round(qty·100).
    */
  def q158TpchQ9(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val p = Tables(spark, dir, "part").filter(col("p_name").contains("widget"))
    val ps = partsupp(spark, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(ps, l("l_partkey") === ps("ps_partkey") && l("l_suppkey") === ps("ps_suppkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) * 100") -
          col("ps_supplycost_cents") * expr("CAST(round(l_quantity * 100) AS BIGINT)"))
        .as("profit_micro"))
      .orderBy(col("nation"), col("o_year"))
  }

  val q158Sql: String =
    s"""WITH $partsuppSql
       |SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) * 100
       |    - ps_supplycost_cents * CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
       |    AS profit_micro
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin

  /** Q16-style (parts/supplier relationship): distinct supplier count per
    * (brand, type, size) bucket over partsupp, excluding one brand, one
    * type, a size list, and flagged suppliers (the fixture lacks
    * s_comment; negative account balance stands in for the complaints
    * filter, as a left-anti join against a tiny supplier subset). The
    * count-distinct aggregates over partsupp-sized input — never touches
    * the fact beyond the derivation.
    */
  def q159TpchQ16(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(3, 9, 14, 19, 23, 36, 45, 49)
    val p = Tables(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
    val excl = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val ps = partsupp(spark, dir)
    ps.join(broadcast(p), ps("ps_partkey") === p("p_partkey"))
      .join(excl, ps("ps_suppkey") === excl("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q159Sql: String =
    s"""WITH $partsuppSql
       |SELECT p_brand, p_type, p_size,
       |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       |FROM partsupp JOIN part ON p_partkey = ps_partkey
       |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
       |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
       |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q12-style (shipping-mode priority): line counts by ship mode and
    * order-priority class for lines received in one year. The fixture has
    * no l_shipmode / l_commitdate / l_receiptdate — all three are
    * md5-hash-DERIVED per line (the partsupp idiom): mode = hash-pick of
    * {MAIL, SHIP, TRUCK}, commit = shipdate + 1..25 days, receipt =
    * shipdate + 1..30 days; the Q12 predicate (commit < receipt, shipped
    * before commit, MAIL/SHIP only) and the high/low priority split then
    * run verbatim. Scan-side derivation — no extra join, no shuffle
    * beyond the orders join and the 3-row rollup.
    */
  def q160TpchQ12(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ColFns.h60
    val lk = concat(col("l_orderkey").cast("string"), lit(":"), col("l_linenumber").cast("string"))
    val l0 = Tables(spark, dir, "lineitem")
    // the literal takes the COLUMN's own type (the generator's timestamp
    // flavor has drifted across driver regenerations — see Tables.events);
    // a mismatched literal would wrap the column in a cast and silently
    // forfeit the pushdown this filter exists for
    val shipT = l0.schema("l_shipdate").dataType
    val l = l0
      // IMPLIED pushable range (r18 optimization): receiptdate = shipdate +
      // (1..30) days and year(receiptdate) = 1996 together force shipdate
      // into [1996-01-01 − 30d, 1996-12-31), so this predicate is a strict
      // superset of the year filter below — zero rows change (oracle
      // hash-checked). Unlike the md5-derived filters, it is a plain
      // column-vs-literal compare, so it reaches the parquet scan as a
      // PushedFilter (row-group min/max skipping) and the 4-md5-per-row
      // synthetic-column filter only runs on the surviving ~1-year slice
      // instead of the whole 7-year table. Measured in OPTIMIZATION_r18.md;
      // plans/r18: PushedFilters now includes l_shipdate bounds.
      .filter(col("l_shipdate") >= lit("1995-12-01").cast(shipT) &&
        col("l_shipdate") < lit("1997-01-01").cast(shipT))
      .withColumn("l_shipmode",
        element_at(array(lit("MAIL"), lit("SHIP"), lit("TRUCK")),
          (h60(concat(lit("m:"), lk)) % 3 + 1).cast("int")))
      .withColumn("l_commitdate",
        date_add(col("l_shipdate").cast("date"), (h60(concat(lit("c:"), lk)) % 25 + 1).cast("int")))
      .withColumn("l_receiptdate",
        date_add(col("l_shipdate").cast("date"), (h60(concat(lit("r:"), lk)) % 30 + 1).cast("int")))
      .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
        col("l_commitdate") < col("l_receiptdate") &&
        col("l_shipdate").cast("date") < col("l_commitdate") &&
        year(col("l_receiptdate")) === 1996)
    val o = Tables(spark, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_shipmode"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy(col("l_shipmode"))
  }

  val q160Sql: String =
    """WITH l AS (
      |  SELECT l_orderkey,
      |    CASE ('0x' || substr(md5('m:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 3
      |      WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' ELSE 'TRUCK' END AS l_shipmode,
      |    CAST(l_shipdate AS DATE) AS sd,
      |    CAST(l_shipdate AS DATE) + CAST(('0x' || substr(md5('c:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 25 + 1 AS INTEGER) AS l_commitdate,
      |    CAST(l_shipdate AS DATE) + CAST(('0x' || substr(md5('r:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 30 + 1 AS INTEGER) AS l_receiptdate
      |  FROM lineitem)
      |SELECT l_shipmode,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM l JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipmode IN ('MAIL', 'SHIP')
      |  AND l_commitdate < l_receiptdate
      |  AND sd < l_commitdate
      |  AND year(l_receiptdate) = 1996
      |GROUP BY l_shipmode ORDER BY l_shipmode""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q146_tpch_q13" -> q146TpchQ13 _,
    "q147_tpch_q19" -> q147TpchQ19 _,
    "q148_tpch_q8" -> q148TpchQ8 _,
    "q149_tpch_q6" -> q149TpchQ6 _,
    "q90_tpch_q3" -> q90TpchQ3 _,
    "q91_tpch_q5" -> q91TpchQ5 _,
    "q92_tpch_q10" -> q92TpchQ10 _,
    "q93_tpch_q18" -> q93TpchQ18 _,
    "q94_tpch_q22" -> q94TpchQ22 _,
    "q124_tpch_q7" -> q124TpchQ7 _,
    "q125_tpch_q14" -> q125TpchQ14 _,
    "q126_tpch_q17" -> q126TpchQ17 _,
    "q127_tpch_q21" -> q127TpchQ21 _,
    "q128_tpch_q4" -> q128TpchQ4 _,
    "q131_tpch_q20" -> q131TpchQ20 _,
    "q138_tpch_q15" -> q138TpchQ15 _,
    "q139_tpch_q11" -> q139TpchQ11 _,
    "q157_tpch_q2" -> q157TpchQ2 _,
    "q158_tpch_q9" -> q158TpchQ9 _,
    "q159_tpch_q16" -> q159TpchQ16 _,
    "q160_tpch_q12" -> q160TpchQ12 _)

  val oracles: Map[String, String] = Map(
    "q146_tpch_q13" -> q146Sql,
    "q147_tpch_q19" -> q147Sql,
    "q148_tpch_q8" -> q148Sql,
    "q149_tpch_q6" -> q149Sql,
    "q90_tpch_q3" -> q90Sql,
    "q91_tpch_q5" -> q91Sql,
    "q92_tpch_q10" -> q92Sql,
    "q93_tpch_q18" -> q93Sql,
    "q94_tpch_q22" -> q94Sql,
    "q124_tpch_q7" -> q124Sql,
    "q125_tpch_q14" -> q125Sql,
    "q126_tpch_q17" -> q126Sql,
    "q127_tpch_q21" -> q127Sql,
    "q128_tpch_q4" -> q128Sql,
    "q131_tpch_q20" -> q131Sql,
    "q138_tpch_q15" -> q138Sql,
    "q139_tpch_q11" -> q139Sql,
    "q157_tpch_q2" -> q157Sql,
    "q158_tpch_q9" -> q158Sql,
    "q159_tpch_q16" -> q159Sql,
    "q160_tpch_q12" -> q160Sql)
}
