package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT per-group percentile_cont without the unbounded aggregation
  * buffer. `percentile()` (Spark's exact aggregate) is an
  * ObjectHashAggregate that buffers EVERY value of a group in executor
  * memory — at 100 TB it is an OOM by construction (the r11 verdict's
  * "exact-rider disease", cured for q194 by the daily-run artifact and
  * here by the VALUE-HISTOGRAM route):
  *
  *   1. `groupBy(group, value).count()` — a codegen hash aggregation with
  *      map-side partial counts; the shuffled frame holds one row per
  *      DISTINCT (group, value), never per input row;
  *   2. cumulative counts over the histogram (window ordered by value)
  *      locate each requested rank: the 0-based order statistic v[i] is
  *      the smallest value whose cumulative count reaches i+1;
  *   3. the continuous-percentile interpolation is computed with EXACTLY
  *      Spark's `Percentile.getPercentile` arithmetic — pos = (n−1)·p,
  *      result = (⌈pos⌉−pos)·v[⌊pos⌋] + (pos−⌊pos⌋)·v[⌈pos⌉] — so results
  *      are bit-identical to the builtin (and to DuckDB's quantile_cont,
  *      which the oracles compare against).
  *
  * Memory: no aggregation buffer ever holds more than a running count;
  * the window sort is spillable. The per-group window partition is
  * DISTINCT-VALUE-sized, so the practical bound is the value column's
  * domain (prices, durations, scores — bounded in every profiling use
  * here); for a genuinely continuous high-cardinality column at 100 TB,
  * pre-bucket the domain or use approx_percentile — the sketch the exact
  * value exists to calibrate.
  */
object ExactQuantiles {

  /** One row per group: `grp, <name> (double)...` for each (name, p) in
    * `ps` — exact percentile_cont of `value` at p within the group.
    */
  def perGroup(df: DataFrame, grp: String, value: String,
      ps: Seq[(String, Double)]): DataFrame = {
    // builtin percentile() ignores NULL values; without this filter the
    // histogram would keep a null-value row and count it into _cum/_n,
    // breaking the bit-identical contract on nullable columns
    val hist = df.filter(col(value).isNotNull)
      .groupBy(col(grp), col(value)).agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(col(grp)).orderBy(col(value))
    val wAll = Window.partitionBy(col(grp))
    val h = hist
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
    def pos(p: Double): Column = (col("_n") - 1).cast("double") * lit(p)
    // rank endpoints per quantile: v[floor(pos)] and v[ceil(pos)], each a
    // conditional min over the histogram — one hash-agg pass for all ps
    val aggs = ps.flatMap { case (name, p) =>
      Seq(
        min(when(col("_cum") >= floor(pos(p)) + 1, col(value)))
          .cast("double").as(s"_lo_$name"),
        min(when(col("_cum") >= ceil(pos(p)) + 1, col(value)))
          .cast("double").as(s"_hi_$name"))
    } :+ max(col("_n")).as("_n")
    val g = h.groupBy(col(grp)).agg(aggs.head, aggs.tail: _*)
    val outs = ps.map { case (name, p) =>
      val lower = floor(pos(p))
      val higher = ceil(pos(p))
      when(lower === higher, col(s"_lo_$name"))
        .otherwise((higher - pos(p)) * col(s"_lo_$name") +
          (pos(p) - lower) * col(s"_hi_$name"))
        .as(name)
    }
    g.select(col(grp) +: outs: _*)
  }
}
