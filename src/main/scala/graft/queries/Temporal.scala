package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal/advanced relational operators the reference lacks entirely
  * (SURVEY.md §2b): as-of join, range join, pivot, grouping sets, exact
  * percentiles, argmax, string-function surface.
  */
object Temporal {

  /** AS-OF join: for each event, the most recent order (by date) of the
    * same customer at or before the event time.
    *
    * Spark-first implementation — the union + last(ignoreNulls) window
    * pattern: tag both streams, sort within key by time (orders before
    * events on ties), carry the last order date forward. ONE shuffle on the
    * key, linear in input — vs the naive inequality join which is
    * O(events x orders) per key. This is the scale path for as-of joins on
    * billions of rows.
    */
  def q70AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        col("event_id"), lit(null).cast("long").as("order_t"), lit(1).as("is_event"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("k"), unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        lit(null).cast("long").as("event_id"), unix_micros(col("o_orderdate").cast("timestamp")).as("order_t"),
        lit(0).as("is_event"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("is_event"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("last_order_t", last(col("order_t"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1 && col("last_order_t").isNotNull)
      .select(col("event_id"), col("k").as("user_id"),
        (col("last_order_t") / 1000000L).cast("long").as("last_order_epoch"))
      .orderBy(col("event_id"))
  }

  val q70Sql: String =
    """SELECT e.event_id, e.user_id,
      |  epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 1000000 AS last_order_epoch
      |FROM events e ASOF JOIN orders o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** Range join: pairs of events by the same user within 5 minutes.
    * Scale path: bucketize time to 5-minute cells, explode the left side to
    * its cell and the next, equi-join on (user, cell), filter the exact
    * predicate, dedup — candidate pairs are O(events x density), never the
    * full per-user cross product.
    *
    * Pairing is on TIME order ((t_a, id_a) < (t_b, id_b) lexicographically),
    * not id order: with the a-side as the earlier event, the later event's
    * cell is always cell(t_a) or cell(t_a)+1, so exploding to those two cells
    * is complete regardless of whether ids are monotone in ts. The output
    * pair is then re-oriented to (min id, max id) to match the oracle.
    */
  /** Core of q71 over any (user_id, event_id, t) frame — factored out so the
    * completeness proof (any id/time order) is testable on synthetic data.
    */
  def closePairCounts(ev: DataFrame, bucketUs: Long): DataFrame = {
    val a = ev.select(col("user_id"), col("event_id").as("id_a"), col("t").as("t_a"),
        explode(array((col("t") / bucketUs).cast("long"),
          (col("t") / bucketUs).cast("long") + 1)).as("cell"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"), col("t").as("t_b"),
        (col("t") / bucketUs).cast("long").as("cell"))
    a.join(b, Seq("user_id", "cell"))
      .filter(
        (col("t_a") < col("t_b") || (col("t_a") === col("t_b") && col("id_a") < col("id_b"))) &&
        col("t_b") - col("t_a") <= bucketUs)
      .select(col("user_id"),
        least(col("id_a"), col("id_b")).as("id_lo"),
        greatest(col("id_a"), col("id_b")).as("id_hi")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_close_pairs"))
      .orderBy(col("user_id"))
  }

  def q71RangeJoin(spark: SparkSession, dir: String): DataFrame =
    closePairCounts(
      Tables(spark, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t")),
      bucketUs = 300L * 1000000L)

  val q71Sql: String =
    """SELECT a.user_id, count(*) AS n_close_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  /** PIVOT: order counts per priority, one column per status. Explicit
    * value list keeps the plan single-pass (no distinct-scan).
    */
  def q72Pivot(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))
  }

  val q72Sql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** GROUPING SETS (beyond rollup/cube): independent slices in one pass —
    * Spark expands once and hash-aggregates with a single shuffle.
    */
  def q73GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("graft_orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM graft_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val q73Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Exact percentiles per group via the BOUNDED value-histogram rider
    * ([[graft.operators.ExactQuantiles.perGroup]]): identical values to
    * `percentile()` (same interpolation arithmetic, bit-for-bit) but no
    * per-group in-memory value buffer — the registered plan is the one
    * that survives 100 TB, not a documented alternative (r11 verdict).
    */
  def q74Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    graft.operators.ExactQuantiles.perGroup(l, "l_returnflag",
        "l_extendedprice", Seq("raw50" -> 0.5, "raw90" -> 0.9, "raw99" -> 0.99))
      .select(col("l_returnflag"),
        round(col("raw50"), 2).as("p50"),
        round(col("raw90"), 2).as("p90"),
        round(col("raw99"), 2).as("p99"))
      .orderBy(col("l_returnflag"))
  }

  val q74Sql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 2) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Argmax/argmin: each customer's biggest order via max_by — single
    * hash-agg, no window, no self-join.
    */
  def q75Argmax(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.groupBy(col("o_custkey"))
      .agg(
        expr("max_by(o_orderkey, o_totalprice)").as("biggest_order"),
        expr("min_by(o_orderkey, o_totalprice)").as("smallest_order"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy(col("o_custkey"))
  }

  val q75Sql: String =
    """SELECT o_custkey,
      |  arg_max(o_orderkey, o_totalprice) AS biggest_order,
      |  arg_min(o_orderkey, o_totalprice) AS smallest_order,
      |  round(max(o_totalprice), 2) AS max_price
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Scalar string-function surface: case, substring, replace, concat,
    * LIKE-filter — all codegen'd builtins.
    */
  def q76StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    p.filter(col("p_name").like("%widget%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 4).as("name_prefix"),
        regexp_replace(col("p_name"), "widget", "gadget").as("renamed"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"))
      .orderBy(col("p_partkey"))
  }

  val q76Sql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  substring(p_name, 1, 4) AS name_prefix,
      |  regexp_replace(p_name, 'widget', 'gadget', 'g') AS renamed,
      |  concat_ws('/', p_brand, p_type) AS brand_type,
      |  CAST(length(p_name) AS BIGINT) AS name_len
      |FROM part WHERE p_name LIKE '%widget%' ORDER BY p_partkey""".stripMargin

  /** RANGE-frame window (value-based, vs q17's ROWS frame): per customer,
    * the rolling count/sum of orders within the trailing 30 DAYS of each
    * order — the interval-window semantics a ROWS frame cannot express
    * (ties on the order day all join the frame). Sums in exact integer
    * cents so frame-internal float ordering can't drift vs the oracle.
    */
  def q77RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30L, 0L)
    o.select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_orders_30d"),
        sum(col("cents")).over(w).as("cents_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q77Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  count(*) OVER w AS n_orders_30d,
      |  CAST(sum(cents) OVER w AS BIGINT) AS cents_30d
      |FROM (SELECT o_custkey, o_orderkey,
      |        date_diff('day', DATE '1992-01-01', o_orderdate) AS day,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |      FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY day RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** FULL OUTER join + null-side handling: customers with no orders AND
    * (synthetic) orders whose customer is filtered out both survive — the
    * join type q14's left-outer shape doesn't cover.
    */
  def q78FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .filter(col("c_custkey") % 3 =!= 0) // drop a third: orphan orders appear
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_mktsegment"), lit("NO_CUSTOMER")).as("segment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("custkey"))
  }

  val q78Sql: String =
    """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
      |  coalesce(c.c_mktsegment, 'NO_CUSTOMER') AS segment,
      |  coalesce(o.n_orders, 0) AS n_orders
      |FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 <> 0) c
      |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
      |  ON c.c_custkey = o.o_custkey
      |ORDER BY custkey""".stripMargin

  /** q116: per-group winsorization audit — the outlier-clipping step a
    * feature pipeline runs before normalization: per language, the
    * p05/p95 bounds of `n_chars` (exact `percentile`, the same
    * Spark↔DuckDB `quantile_cont` alignment q74 proved) and how many
    * documents fall outside each tail. Bounds come from one tiny
    * lang-keyed agg broadcast back; the clip comparison is a scan-side
    * filter — counts only, no order-sensitive float sum anywhere. At
    * 100 TB swap `percentile` for `approx_percentile` (same API, sketch
    * -mergeable) and nothing else changes.
    */
  def q116Winsorize(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val bounds = d.groupBy(col("lang")).agg(
      expr("percentile(n_chars, 0.05)").as("p05"),
      expr("percentile(n_chars, 0.95)").as("p95"))
    d.join(broadcast(bounds), Seq("lang"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("n_chars") < col("p05"), lit(1))).as("n_below"),
        count(when(col("n_chars") > col("p95"), lit(1))).as("n_above"),
        round(first(col("p05")), 2).as("p05"),
        round(first(col("p95")), 2).as("p95"))
      .orderBy(col("lang"))
  }

  val q116Sql: String =
    """WITH b AS (
      |  SELECT lang, quantile_cont(n_chars, 0.05) AS p05,
      |         quantile_cont(n_chars, 0.95) AS p95
      |  FROM documents GROUP BY lang)
      |SELECT d.lang, count(*) AS n_docs,
      |  count(CASE WHEN n_chars < p05 THEN 1 END) AS n_below,
      |  count(CASE WHEN n_chars > p95 THEN 1 END) AS n_above,
      |  round(p05, 2) AS p05, round(p95, 2) AS p95
      |FROM documents d JOIN b USING (lang)
      |GROUP BY d.lang, p05, p95 ORDER BY d.lang""".stripMargin

  /** q188 — TIME-WEIGHTED AVERAGE (TWAP / last-observation step function),
    * the finance/IoT aggregate a plain AVG gets wrong whenever
    * observations arrive unevenly: per (user, day), each event's value
    * HOLDS until the next event (or the day's end), and the average
    * weights every value by its holding duration. All arithmetic is
    * exact: value crosses as integer cents (the q93 idiom), durations
    * are epoch-microsecond differences, and twap_cents =
    * Σ(cents·dur) div Σ(dur) — one integer division per group, so the
    * engines cannot drift on float summation order. (Bounds: cents <
    * 2^16, dur ≤ 8.64·10^10 µs, so each product < 2^53 and a day's sum
    * stays far under 2^63.) The uncovered span before a day's first
    * observation is excluded (TWAP over the observed span) — `span_us`
    * makes that window explicit per row.
    *
    * Scale: one lead() window per (user, day) partition — fully
    * parallel, no global order — then one group aggregate; the output is
    * users × active-days, never events.
    */
  def q188Twap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("day", expr("t div 86400000000"))
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("t"), col("event_id"))
    e.withColumn("dur",
        coalesce(lead(col("t"), 1).over(w), (col("day") + 1) * 86400000000L) - col("t"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("dur")).as("span_us"),
        expr("sum(cents * dur) div sum(dur)").as("twap_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .select(col("user_id"), (col("day") * 86400).as("day_ts"), col("n_obs"),
        col("span_us"), col("twap_cents"), col("min_cents"), col("max_cents"))
      .orderBy(col("user_id"), col("day_ts"))
  }

  val q188Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |d AS (
      |  SELECT user_id, day, cents,
      |    coalesce(lead(t) OVER (PARTITION BY user_id, day ORDER BY t, event_id),
      |      (day + 1) * 86400000000) - t AS dur
      |  FROM e)
      |SELECT user_id, day * 86400 AS day_ts, CAST(count(*) AS BIGINT) AS n_obs,
      |  CAST(sum(dur) AS BIGINT) AS span_us,
      |  CAST(sum(cents * dur) // sum(dur) AS BIGINT) AS twap_cents,
      |  min(cents) AS min_cents, max(cents) AS max_cents
      |FROM d GROUP BY user_id, day
      |ORDER BY user_id, day_ts""".stripMargin

  /** q228 — EXACT WEIGHTED MEDIAN per group: the robust aggregate where
    * each row votes with a WEIGHT (here: price weighted by quantity — "the
    * price at which half the VOLUME traded", not half the line items),
    * the statistic inventory-costing and fee-schedule analyses need and
    * neither engine ships as a built-in. Computed by the cumulative-weight
    * sweep: order rows per group, running weight W_i, the weighted median
    * is the FIRST ELEMENT with 2·W_i ≥ W_total — picked by rank, never
    * interpolated (the q153/q186 element-not-interpolation doctrine), so
    * every emitted value is a datum and everything is exact integer cents.
    * Group-partitioned windows only; ties break on the full unique key.
    *
    * Scale: one group-keyed exchange for the ordered window; the pick is
    * a filter + min-agg. The unweighted median is the q74/q153 machinery;
    * this closes the weighted half of the quantile family.
    */
  def q228WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_cents"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val wCum = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("price_cents"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(col("l_returnflag"))
    l.withColumn("cumw", sum(col("w")).over(wCum))
      .withColumn("wtot", sum(col("w")).over(wTot))
      .filter(lit(2) * col("cumw") >= col("wtot"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_at_or_above"),
        max(col("wtot")).as("w_total"),
        min(col("price_cents")).as("wmedian_cents"))
      .orderBy(col("l_returnflag"))
  }

  val q228Sql: String =
    """WITH l AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS w,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (
      |  SELECT l_returnflag, price_cents,
      |    sum(w) OVER (PARTITION BY l_returnflag
      |      ORDER BY price_cents, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    sum(w) OVER (PARTITION BY l_returnflag) AS wtot
      |  FROM l)
      |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_at_or_above,
      |  CAST(max(wtot) AS BIGINT) AS w_total,
      |  min(price_cents) AS wmedian_cents
      |FROM c WHERE 2 * cumw >= wtot
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q228_weighted_median" -> q228WeightedMedian _,
    "q188_twap" -> q188Twap _,
    "q116_winsorize" -> q116Winsorize _,
    "q70_asof_join" -> q70AsofJoin _,
    "q71_range_join" -> q71RangeJoin _,
    "q72_pivot" -> q72Pivot _,
    "q73_grouping_sets" -> q73GroupingSets _,
    "q74_percentiles" -> q74Percentiles _,
    "q75_argmax" -> q75Argmax _,
    "q76_string_funcs" -> q76StringFuncs _,
    "q77_range_window" -> q77RangeWindow _,
    "q78_full_outer" -> q78FullOuter _)

  val oracles: Map[String, String] = Map(
    "q228_weighted_median" -> q228Sql,
    "q188_twap" -> q188Sql,
    "q116_winsorize" -> q116Sql,
    "q70_asof_join" -> q70Sql,
    "q71_range_join" -> q71Sql,
    "q72_pivot" -> q72Sql,
    "q73_grouping_sets" -> q73Sql,
    "q74_percentiles" -> q74Sql,
    "q75_argmax" -> q75Sql,
    "q76_string_funcs" -> q76Sql,
    "q77_range_window" -> q77Sql,
    "q78_full_outer" -> q78Sql)
}
