package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic, mergeable sketch summaries — the "tiny state that
  * answers big questions" layer every 100 TB pipeline leans on when an
  * exact distinct/frequency pass would need a full shuffle of the key
  * space. Both sketches here use the engine's md5-derived hash family
  * (the same `('0x' || substr(md5(s),1,15))::BIGINT` arithmetic the dedup
  * stack oracles with, Dedup.scala), so the DuckDB oracle restates the
  * ENTIRE sketch bit-for-bit: these rows prove the sketch math, not just
  * row counts. No library sketch (HLL/datasketches) could be oracled this
  * way — determinism is the point.
  *
  * Scale shape (both): the sketch state is O(k) per group, built by one
  * map-side-combinable aggregation; merging two shards' sketches is
  * union-then-truncate (KMV) / counter-add (CMS), so a 1000-executor
  * build is the same plan with more partitions. (Reference context: the
  * reference's only aggregation is the run-summary count,
  * lib/batchProcessing.js:250-296 — this is §2b scale-layer surface.)
  */
object SketchOps {

  /** q136 — KMV (k-minimum-values) distinct-count sketch, Bar-Yossef et
    * al. 2002: per event_type, hash every user_id with md5_60, keep the
    * k=8 smallest DISTINCT hash values; the k-th smallest estimates the
    * cardinality as (k-1)·2^60 / h_k (hashes spread uniformly on [0,2^60),
    * so the k-th order statistic sits near k/n of the range). With fewer
    * than k distinct hashes the sketch IS the exact set, so the estimate
    * is n_mins itself.
    *
    * Everything is integral: 7·2^60 = 8070450532247928832 fits BIGINT and
    * `div` floors identically in both engines. The exact distinct count
    * rides along so the row itself exhibits the estimate-vs-truth gap.
    *
    * Scale: the row_number ≤ k filter compiles to WindowGroupLimit — a
    * map-side per-partition top-k heap BEFORE the shuffle (PlanSpec-gated),
    * so the exchange carries at most k rows per (partition, group): the
    * classic mergeable-sketch build. The exact count (one groupBy) is the
    * expensive half — at 100 TB you'd drop it and keep only the sketch.
    */
  def q136KmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val h = e.select(
        col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val mins = h.withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
    val kth = mins.groupBy(col("event_type"))
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("n_mins"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    kth.join(exact, "event_type")
      .select(
        col("event_type"), col("kth_hash"), col("n_mins"),
        when(col("n_mins") === 8L,
          expr("8070450532247928832 div kth_hash"))
          .otherwise(col("n_mins")).as("est_distinct"),
        col("exact_distinct"))
      .orderBy(col("event_type"))
  }

  val q136Sql: String =
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |  FROM h),
      |k AS (
      |  SELECT event_type, max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS n_mins
      |  FROM r WHERE rn <= 8 GROUP BY event_type),
      |ex AS (
      |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      |  FROM events GROUP BY event_type)
      |SELECT event_type, kth_hash, n_mins,
      |  CASE WHEN n_mins = 8 THEN 8070450532247928832 // kth_hash
      |       ELSE n_mins END AS est_distinct,
      |  exact_distinct
      |FROM k JOIN ex USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** q137 — Count-Min sketch frequency estimates, Cormode–Muthukrishnan
    * 2005: d=4 hash rows × w=64 counters summarize the full user_id
    * frequency distribution in 256 integers. Hash family is the engine's
    * Kirsch–Mitzenmacher double hash (bucket_j = (md5_60 + j·md5_52) mod w
    * — one md5 per key, j·h2 < 2^54 so the sum never overflows), the same
    * construction q40's MinHash banding oracles with. The estimate for a
    * key is min_j counter[j][bucket_j(key)] — always ≥ the true count
    * (collisions only ADD), which SketchSpec asserts.
    *
    * The row emits the 5 heaviest true users with true vs estimated
    * counts, so the output exhibits the one-sided error bound.
    *
    * Scale: the counter build is a narrow 4× explode then a 256-key
    * groupBy — fully map-side-combinable, output size independent of the
    * corpus; shard sketches merge by adding counters. The probe side is
    * 5 keys × 4 rows joined against the 256-row counter table, which the
    * plan must broadcast (PlanSpec-gated).
    */
  private def withCmsHashes(df: DataFrame): DataFrame = df
    .withColumn("h1", conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10).cast("long"))
    .withColumn("h2", conv(substring(md5(col("user_id").cast("string")), 17, 13), 16, 10).cast("long"))

  private val cmsRows = explode(array((0 until 4).map(lit): _*)).as("j")

  /** The d=4 × w=64 counter table for a stream of user_id occurrences —
    * 256 rows regardless of input size, map-side-combinable.
    */
  private[graft] def cmsCounters(e: DataFrame): DataFrame =
    withCmsHashes(e.select(col("user_id")))
      .select(cmsRows, col("h1"), col("h2"))
      .select(col("j"), pmod(col("h1") + col("j") * col("h2"), lit(64L)).as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** CMS point estimates for `keys` (must carry user_id; other columns ride
    * along as group keys) against `counters`.
    */
  private[graft] def cmsEstimate(keys: DataFrame, counters: DataFrame): DataFrame = {
    val probes = withCmsHashes(keys)
      .select(col("*"), cmsRows)
      .select(keys.columns.map(col) :+ col("j") :+
        pmod(col("h1") + col("j") * col("h2"), lit(64L)).as("bucket"): _*)
    probes.join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(keys.columns.map(col): _*)
      .agg(min(col("cnt")).as("est_cnt"))
  }

  def q137CmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val top = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("user_id"))
      .limit(5)
    cmsEstimate(top, cmsCounters(e))
      .orderBy(col("true_cnt").desc, col("user_id"))
  }

  val q137Sql: String =
    """WITH h AS (
      |  SELECT user_id,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h1,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 17, 13))::BIGINT AS h2
      |  FROM events),
      |j AS (SELECT unnest([0, 1, 2, 3]) AS j),
      |c AS (
      |  SELECT j, (h1 + j * h2) % 64 AS bucket, CAST(count(*) AS BIGINT) AS cnt
      |  FROM h CROSS JOIN j GROUP BY j, bucket),
      |top AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
      |  FROM events GROUP BY user_id
      |  ORDER BY true_cnt DESC, user_id LIMIT 5),
      |probe AS (
      |  SELECT t.user_id, t.true_cnt, j.j,
      |    (hh.h1 + j.j * hh.h2) % 64 AS bucket
      |  FROM top t
      |  JOIN (SELECT DISTINCT user_id, h1, h2 FROM h) hh ON hh.user_id = t.user_id
      |  CROSS JOIN j)
      |SELECT p.user_id, p.true_cnt, min(c.cnt) AS est_cnt
      |FROM probe p JOIN c ON c.j = p.j AND c.bucket = p.bucket
      |GROUP BY p.user_id, p.true_cnt
      |ORDER BY p.true_cnt DESC, p.user_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_kmv_distinct" -> q136KmvDistinct _,
    "q137_cms_heavy_hitters" -> q137CmsHeavyHitters _)

  val oracles: Map[String, String] = Map(
    "q136_kmv_distinct" -> q136Sql,
    "q137_cms_heavy_hitters" -> q137Sql)
}
