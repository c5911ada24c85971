package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-layout operators: the write-path clustering tools a 100 TB table
  * needs so that READS can skip data. The reference has no layout surface
  * (it streams one file, `lib/batchProcessing.js:314-320`); this is the
  * Spark-side analogue of Delta/Iceberg `OPTIMIZE ZORDER BY` — compute a
  * space-filling-curve key over several columns, range-partition + sort by
  * it at write time, and every parquet row group's min/max zonemap becomes
  * tight in ALL interleaved dimensions at once, so predicates on ANY of
  * them prune row groups. A single-column sort gives one tight dimension
  * and leaves the others striped across the whole file; the Z-order curve
  * trades a little tightness in each dimension for tightness in all.
  */
object LayoutOps {

  /** Interleave the low 16 bits of `x` with zeros (Morton spread): the
    * classic mask-and-shift ladder, 4 shift+or+and steps, all codegen'd
    * integer ops — no UDF, no branching.
    */
  private[queries] def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton/Z-order key of two 16-bit normalized coordinates. */
  private[queries] def morton2(xn: Column, yn: Column): Column =
    spread16(xn).bitwiseOR(shiftleft(spread16(yn), 1))

  /** Coarse Z-cell: the top [[Q107BucketBits]] bits of the 32-bit key. */
  private[graft] val Q107BucketBits = 12

  /** q107: Z-order layout audit over `lineitem (l_partkey, l_suppkey)` —
    * per coarse Z-cell, the row count and the RAW min/max of both
    * dimensions. The point of the output: every cell's span is bounded in
    * BOTH columns at once (top-6-of-16 normalized bits fixed per
    * dimension → raw span ≲ range/64 per cell), which is exactly the
    * zonemap property a Z-ordered write gives every row group. At
    * deployment the same `zkey` feeds `repartitionByRange(zkey)` +
    * `sortWithinPartitions(zkey)` on the write path; this query is the
    * audit that proves the layout skips.
    *
    * Coordinates normalize to 16 bits through DATA-DERIVED bounds — one
    * broadcast one-row min/max agg (the q94/q95 idiom, no fixture
    * literals) — then pure integer arithmetic: normalize is one integral
    * multiply-divide, the curve key is 8 shift-mask ops, so every value is
    * BIGINT-exact and the oracle restates it bit for bit. One scan + one
    * cell-keyed aggregation (≤ 2^[[Q107BucketBits]] keys); nothing about
    * the shape changes at 1000× the rows.
    */
  /** The z-order WRITE path q107 audits: Morton-key `df` on (xCol, yCol)
    * with data-derived bounds, range-partition by the key into `nFiles`
    * files, sort within each — the OPTIMIZE ZORDER analogue. Every output
    * file covers a contiguous zkey range, so its parquet footer min/max is
    * tight in BOTH dimensions at once and a 2-dim box predicate skips the
    * row groups whose cells miss the box (gate: PlanSpec scan-metrics
    * test). At 100 TB this replaces the read-side audit: pay the one
    * range exchange at write time, every future 2-dim scan prunes.
    */
  /** Attach the 32-bit Morton `zkey` over (xCol, yCol) with data-derived
    * broadcast bounds — the ONE quantize+interleave ladder shared by the
    * q107 audit and the write path, so they can never disagree on the key.
    */
  private[queries] def withZkey(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val bounds = df.agg(
      min(col(xCol)).as("minx"), max(col(xCol)).as("maxx"),
      min(col(yCol)).as("miny"), max(col(yCol)).as("maxy"))
    val xn = expr(s"(($xCol - minx) * 65535) div greatest(1, maxx - minx)")
    val yn = expr(s"(($yCol - miny) * 65535) div greatest(1, maxy - miny)")
    df.crossJoin(broadcast(bounds))
      .withColumn("zkey", morton2(xn, yn))
      .drop("minx", "maxx", "miny", "maxy")
  }

  def writeZordered(df: DataFrame, xCol: String, yCol: String,
      outPath: String, nFiles: Int = 16): Unit =
    withZkey(df, xCol, yCol)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").parquet(outPath)

  def q107ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    withZkey(l.select(col("l_partkey"), col("l_suppkey")), "l_partkey", "l_suppkey")
      .withColumn("zcell", expr(s"zkey div ${1L << (32 - Q107BucketBits)}"))
      .groupBy(col("zcell"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
        min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"))
      .orderBy(col("zcell"))
  }

  /** Oracle: the identical integer ladder as chained CTEs — DuckDB's
    * `&`/`|`/`<<` on BIGINT match Spark's, and `//` = `div` on the
    * non-negative operands used here.
    */
  val q107Sql: String = {
    // one mask-and-shift rung of the Morton spread, applied to both coords
    def rung(from: String, to: String, shift: Int, mask: Long): String =
      s"""$to AS (
         |  SELECT pk, sk, ((x | (x << $shift)) & $mask) AS x,
         |                 ((y | (y << $shift)) & $mask) AS y
         |  FROM $from)""".stripMargin
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS minx, max(l_partkey) AS maxx,
       |         min(l_suppkey) AS miny, max(l_suppkey) AS maxy
       |  FROM lineitem),
       |s0 AS (
       |  SELECT l_partkey AS pk, l_suppkey AS sk,
       |    (((l_partkey - minx) * 65535) // greatest(1, maxx - minx)) & 65535 AS x,
       |    (((l_suppkey - miny) * 65535) // greatest(1, maxy - miny)) & 65535 AS y
       |  FROM lineitem, b),
       |${rung("s0", "s1", 8, 0x00FF00FFL)},
       |${rung("s1", "s2", 4, 0x0F0F0F0FL)},
       |${rung("s2", "s3", 2, 0x33333333L)},
       |${rung("s3", "s4", 1, 0x55555555L)},
       |z AS (SELECT pk, sk, (x | (y << 1)) AS zkey FROM s4)
       |SELECT zkey // ${1L << (32 - Q107BucketBits)} AS zcell,
       |  count(*) AS n_rows,
       |  min(pk) AS min_pk, max(pk) AS max_pk,
       |  min(sk) AS min_sk, max(sk) AS max_sk
       |FROM z GROUP BY 1 ORDER BY zcell""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_zorder_layout" -> q107ZorderLayout _)

  val oracles: Map[String, String] = Map(
    "q107_zorder_layout" -> q107Sql)
}
