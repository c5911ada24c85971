package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** k for every KMV sketch in this module, and the estimate numerator
    * (k−1)·2^60 — ONE definition each, interpolated into both the Spark
    * expressions and the oracle SQL so the two sides cannot drift.
    */
  private[graft] val KmvK = 8
  private[graft] val KmvNum: Long = (KmvK - 1).toLong * (1L << 60)

  /** The module's 60-bit md5 hash (the dedup stack's shared family). */
  private def md5_60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Keep the k smallest `h` per partition group — the bottom-k-by-hash
    * build every coordinated sketch here shares (KMV mins, q153's sample).
    */
  private[graft] def bottomK(df: DataFrame, k: Int, parts: String*): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*).orderBy(col("h"))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** The KMV build: keep the k smallest `h` per partition group. */
  private def kMins(df: DataFrame, parts: String*): DataFrame =
    bottomK(df, KmvK, parts: _*)

  /** The KMV estimate off an aggregated (kth_hash, n-mins) pair: exact
    * below k, (k−1)·2^60 div h_k at k.
    */
  private def kmvEstimate(nMins: Column): Column =
    when(nMins === KmvK.toLong, expr(s"$KmvNum div kth_hash")).otherwise(nMins)

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
    val h = e.select(col("event_type"), md5_60(col("user_id")).as("h"))
      .distinct()
    val mins = kMins(h, "event_type")
    val kth = mins.groupBy(col("event_type"))
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("n_mins"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    kth.join(exact, "event_type")
      .select(
        col("event_type"), col("kth_hash"), col("n_mins"),
        kmvEstimate(col("n_mins")).as("est_distinct"),
        col("exact_distinct"))
      .orderBy(col("event_type"))
  }

  val q136Sql: String =
    s"""WITH h AS (
      |  SELECT DISTINCT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |  FROM h),
      |k AS (
      |  SELECT event_type, max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS n_mins
      |  FROM r WHERE rn <= $KmvK GROUP BY event_type),
      |ex AS (
      |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      |  FROM events GROUP BY event_type)
      |SELECT event_type, kth_hash, n_mins,
      |  CASE WHEN n_mins = $KmvK THEN $KmvNum // kth_hash
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
      .select(keys.columns.toIndexedSeq.map(col) :+ col("j") :+
        pmod(col("h1") + col("j") * col("h2"), lit(64L)).as("bucket"): _*)
    probes.join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(keys.columns.toIndexedSeq.map(col): _*)
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

  /** q181's sample size (bottom-k per column) and the FK-candidate
    * containment threshold in basis points.
    */
  private[graft] val IndK = 64
  private[graft] val IndThreshBp = 9000L

  /** The profiled (table, column) universe for q181 — key columns across
    * the star schema; the true FK edges (l_orderkey→o_orderkey,
    * o_custkey→c_custkey, l_partkey→p_partkey, l_suppkey→s_suppkey) are
    * planted among decoys.
    */
  private[graft] val IndCols: Seq[(String, String)] = Seq(
    "orders" -> "o_custkey", "customer" -> "c_custkey",
    "orders" -> "o_orderkey", "lineitem" -> "l_orderkey",
    "lineitem" -> "l_partkey", "part" -> "p_partkey",
    "lineitem" -> "l_suppkey", "supplier" -> "s_suppkey")

  /** q181 — INCLUSION-DEPENDENCY / FOREIGN-KEY DISCOVERY by coordinated
    * sketch containment (Metanome/SINDY-style profiling, estimated the
    * Beyer et al. 2007 way): for every ordered column pair (A, B) across
    * the schema, estimate containment(A ⊆ B) = |A∩B| / |A| from each
    * column's bottom-k-by-hash sketch. Because every column hashes its
    * VALUES with the same md5 family (no per-column salt — cross-column
    * comparability is the point), the k smallest hashes of A ∪ B are a
    * coordinated uniform sample of the union, and within that sample the
    * count-ratio `matches / in_a` (members of both ÷ members of A)
    * estimates containment with NO cardinality arithmetic — two small
    * integer counts per pair, immune to overflow at any scale. The exact
    * containment rides along computed the scalable way: one VALUE-KEYED
    * self-join of the distinct (column, value) frame — each value emits
    * (cols sharing it)² pairs, ≤ 8² here, so the exact pass is linear in
    * distinct values, never pairwise in columns × rows.
    *
    * At 100 TB the sketches alone answer: 8 columns × 64 hashes of state,
    * mergeable per shard (same union-truncate argument as q141), so
    * schema-wide FK screening over a lake costs one scan per table — the
    * exact rider is dropped and candidates above [[IndThreshBp]] go to
    * verification. Caveat the row makes visible: integer surrogate-key
    * domains overlap numerically (c_custkey values ⊂ p_partkey values
    * here), so real profilers AND containment with type/name signals —
    * the decoy pairs in the output ARE that lesson.
    */
  def q181FkDiscovery(spark: SparkSession, dir: String): DataFrame = {
    // NULLs are excluded up front: md5_60(NULL) is a NULL hash, and Spark's
    // ascending sort puts NULLs first while DuckDB's puts them last — the
    // sketch is defined over non-null values so both engines agree on any
    // fixture.
    val vals = IndCols.map { case (t, c) =>
      Tables(spark, dir, t)
        .select(lit(s"$t.$c").as("col_id"), col(c).cast("long").as("v"))
        .filter(col("v").isNotNull)
        .distinct()
    }.reduce(_.unionByName(_))
    val mins = bottomK(
      vals.select(col("col_id"), md5_60(col("v")).as("h")), IndK, "col_id")
    val cols = mins.select(col("col_id")).distinct()
    val pairs = cols.select(col("col_id").as("col_a"))
      .crossJoin(cols.select(col("col_id").as("col_b")))
      .filter(col("col_a") =!= col("col_b"))
    // the union's bottom-k per pair, with membership flags for each side
    val tagged = pairs.join(mins.withColumnRenamed("col_id", "col_a"), Seq("col_a"))
      .select(col("col_a"), col("col_b"), col("h"), lit(1).as("fa"), lit(0).as("fb"))
      .unionByName(
        pairs.join(mins.withColumnRenamed("col_id", "col_b"), Seq("col_b"))
          .select(col("col_a"), col("col_b"), col("h"), lit(0).as("fa"), lit(1).as("fb")))
      .groupBy(col("col_a"), col("col_b"), col("h"))
      .agg(max(col("fa")).as("in_a"), max(col("fb")).as("in_b"))
    val w = Window.partitionBy(col("col_a"), col("col_b")).orderBy(col("h"))
    val est = tagged.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= IndK)
      .groupBy(col("col_a"), col("col_b"))
      .agg(sum(col("in_a")).as("sample_a"),
        sum(col("in_a") * col("in_b")).as("matches"))
    // exact containment via ONE value-keyed self-join (linear in values)
    val inter = vals.select(col("col_id").as("col_a"), col("v"))
      .join(vals.select(col("col_id").as("col_b"), col("v")), "v")
      .filter(col("col_a") =!= col("col_b"))
      .groupBy(col("col_a"), col("col_b")).agg(count(lit(1)).as("inter"))
    val sizes = vals.groupBy(col("col_id")).agg(count(lit(1)).as("n"))
    est
      .join(sizes.select(col("col_id").as("col_a"), col("n").as("n_a")), "col_a")
      .join(sizes.select(col("col_id").as("col_b"), col("n").as("n_b")), "col_b")
      .join(inter, Seq("col_a", "col_b"), "left")
      .select(col("col_a"), col("col_b"), col("n_a"), col("n_b"),
        col("sample_a"), col("matches"),
        when(col("sample_a") === 0, lit(null))
          .otherwise(expr("10000 * matches div sample_a")).as("est_containment_bp"),
        expr("10000 * coalesce(inter, 0) div n_a").as("exact_containment_bp"),
        (coalesce(when(col("sample_a") === 0, lit(null))
          .otherwise(expr("10000 * matches div sample_a")), lit(0L)) >= IndThreshBp)
          .as("fk_candidate"))
      .orderBy(col("col_a"), col("col_b"))
  }

  val q181Sql: String = {
    val valsSql = IndCols.map { case (t, c) =>
      s"SELECT DISTINCT '$t.$c' AS col_id, CAST($c AS BIGINT) AS v FROM $t WHERE $c IS NOT NULL"
    }.mkString("\n      |  UNION ALL ")
    s"""WITH vals AS (
      |  $valsSql),
      |hs AS (
      |  SELECT col_id, v,
      |    ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM vals),
      |mins AS (
      |  SELECT col_id, h FROM (
      |    SELECT col_id, h, row_number() OVER (PARTITION BY col_id ORDER BY h) AS rn
      |    FROM hs)
      |  WHERE rn <= $IndK),
      |cols AS (SELECT DISTINCT col_id FROM mins),
      |pairs AS (
      |  SELECT a.col_id AS col_a, b.col_id AS col_b
      |  FROM cols a, cols b WHERE a.col_id <> b.col_id),
      |tagged AS (
      |  SELECT col_a, col_b, h, max(fa) AS in_a, max(fb) AS in_b FROM (
      |    SELECT p.col_a, p.col_b, m.h, 1 AS fa, 0 AS fb
      |    FROM pairs p JOIN mins m ON m.col_id = p.col_a
      |    UNION ALL
      |    SELECT p.col_a, p.col_b, m.h, 0 AS fa, 1 AS fb
      |    FROM pairs p JOIN mins m ON m.col_id = p.col_b)
      |  GROUP BY 1, 2, 3),
      |est AS (
      |  SELECT col_a, col_b,
      |    CAST(sum(in_a) AS BIGINT) AS sample_a,
      |    CAST(sum(in_a * in_b) AS BIGINT) AS matches
      |  FROM (
      |    SELECT col_a, col_b, in_a, in_b,
      |      row_number() OVER (PARTITION BY col_a, col_b ORDER BY h) AS rn
      |    FROM tagged)
      |  WHERE rn <= $IndK GROUP BY 1, 2),
      |inter AS (
      |  SELECT a.col_id AS col_a, b.col_id AS col_b, CAST(count(*) AS BIGINT) AS inter
      |  FROM vals a JOIN vals b ON a.v = b.v AND a.col_id <> b.col_id
      |  GROUP BY 1, 2),
      |sizes AS (SELECT col_id, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY col_id)
      |SELECT e.col_a, e.col_b, na.n AS n_a, nb.n AS n_b, e.sample_a, e.matches,
      |  CASE WHEN e.sample_a = 0 THEN NULL
      |       ELSE 10000 * e.matches // e.sample_a END AS est_containment_bp,
      |  10000 * coalesce(i.inter, 0) // na.n AS exact_containment_bp,
      |  coalesce(CASE WHEN e.sample_a = 0 THEN NULL
      |       ELSE 10000 * e.matches // e.sample_a END, 0) >= $IndThreshBp AS fk_candidate
      |FROM est e
      |JOIN sizes na ON na.col_id = e.col_a
      |JOIN sizes nb ON nb.col_id = e.col_b
      |LEFT JOIN inter i ON i.col_a = e.col_a AND i.col_b = e.col_b
      |ORDER BY e.col_a, e.col_b""".stripMargin
  }

  /** q183 — EXACT mergeable distinct via BITMAP words: the deterministic
    * exact counterpart to q151's approximate rolling KMV. Per (event_type,
    * day), user presence compresses into 64-bit words — word = user_id
    * div 32, bit = user_id mod 32, `bit_or` builds the word — and any
    * 7-day window's EXACT distinct count is the popcount of the OR-merged
    * daily words. This is the precomputed-bitmap-cube technique (roaring/
    * Druid-style): state per (group, day) is |users|/32 integers, merge
    * is a word-keyed `bit_or` (associative, shard-parallel), and unlike a
    * sketch the answer is exact — the right tool when user ids are dense
    * integers and the distinct question must be auditable. The exact
    * rider recomputes each window by brute countDistinct and MUST equal
    * the bitmap path row-for-row (asserted by the oracle AND the spec —
    * equality is the whole claim).
    *
    * Scale: daily bitmap build is one map-side-combinable agg; window
    * answers touch days×words bitmap rows, never raw events (same replay
    * shape as q151, but lossless). The explode-to-window-ends join is
    * equi-keyed (no range join) per the q117/q151 idiom.
    */
  /** (event_type, day, word, bit) cells — NOT deduplicated: `bit_or` is
    * idempotent, so the word build needs no distinct (which is what lets
    * the same aggregation run as single-level STREAMING state in q187).
    */
  private[graft] def bitmapCells(e: DataFrame): DataFrame =
    e.select(col("event_type"),
      datediff(to_date(col("ts")), lit("1970-01-01")).as("day"),
      expr("user_id div 32").as("word"),
      expr("CAST(user_id % 32 AS INT)").as("bit"))

  /** Daily bitmap words: one map-side-combinable idempotent aggregate. */
  private[graft] def bitmapWords(cells: DataFrame): DataFrame =
    cells.groupBy(col("event_type"), col("day"), col("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("bits"))

  /** The 7-day roll + popcount over a daily word table, with the brute
    * countDistinct rider from raw presence cells — shared by the batch
    * build (q183) and the streamed-state build (q187), so "how the words
    * accumulated" is provably invisible to the answer.
    */
  private[graft] def bitmapRolled(bm: DataFrame, pres: DataFrame): DataFrame = {
    val ends = bm.select(col("event_type"), col("day").as("end_day")).distinct()
    val rolled = bm
      .withColumn("end_day", explode(sequence(col("day"), col("day") + 6)))
      .join(ends, Seq("event_type", "end_day"))
      .groupBy(col("event_type"), col("end_day"), col("word"))
      .agg(expr("bit_or(bits)").as("bits"))
    val agg = rolled.groupBy(col("event_type"), col("end_day"))
      .agg(count(lit(1)).as("n_words"),
        sum(expr("bit_count(bits)")).cast("long").as("bitmap_distinct"))
    val ex = pres
      .withColumn("end_day", explode(sequence(col("day"), col("day") + 6)))
      .join(ends, Seq("event_type", "end_day"))
      .groupBy(col("event_type"), col("end_day"))
      .agg(countDistinct(expr("word * 32 + bit")).as("exact_distinct"))
    agg.join(ex, Seq("event_type", "end_day"))
      .orderBy(col("event_type"), col("end_day"))
  }

  def q183BitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val cells = bitmapCells(Tables(spark, dir, "events"))
    bitmapRolled(bitmapWords(cells.distinct()), cells.distinct())
  }

  /** Injective sparsifier for the q243 fixture: spreads the dense test
    * user ids ~2²⁰ apart, so naive `sid div 32` packing degenerates to
    * one word per user — the failure mode the dictionary remap exists to
    * fix (SURVEY §9: "sparse ids → remap through a dictionary first").
    */
  private[graft] val Q243Spread = 1048583L

  /** Dictionary buckets for the two-level dense rank. Driver state is one
    * count row per bucket — bounded, never data-sized.
    */
  private[graft] val Q243DictBuckets = 256

  /** Order-preserving dense rank over a distinct id column WITHOUT a
    * single-partition global window: range-bucket the domain from a
    * broadcast one-row min/max agg, rank WITHIN each bucket (a
    * partitioned window), and add the buckets' driver-side prefix-sum
    * offsets (≤ [[Q243DictBuckets]] rows collected — the q55/q220 bounded
    * pattern). Equals `row_number() OVER (ORDER BY id) - 1` exactly,
    * which is how the oracle restates it.
    */
  private[graft] def denseDict(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    val mm = ids.agg(min(col(idCol)).as("mn"), max(col(idCol)).as("mx")).head()
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val span = (mx - mn) / Q243DictBuckets + 1
    val b = ids.withColumn("_bkt", ((col(idCol) - lit(mn)) / lit(span)).cast("int"))
    val counts = b.groupBy(col("_bkt")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until Q243DictBuckets).scanLeft(0L) {
      (acc, i) => acc + counts.getOrElse(i, 0L)
    }
    import spark.implicits._
    val offDf = (0 until Q243DictBuckets).map(i => (i, offsets(i))).toDF("_bkt", "_off")
    val w = Window.partitionBy(col("_bkt")).orderBy(col(idCol))
    b.join(broadcast(offDf), Seq("_bkt"))
      .withColumn("did", row_number().over(w).cast("long") - 1L + col("_off"))
      .select(col(idCol), col("did"))
  }

  /** q243 — the q183 bitmap cube under SPARSE user ids: ids spread ~2²⁰
    * apart pack one-user-per-word if used raw (word table ≈ user table —
    * the cube's economics destroyed), so the build first remaps them
    * through a deterministic dense dictionary ([[denseDict]]) and packs
    * the DENSE ids. Distinct counts are invariant under the bijection —
    * the spec asserts q243's bitmap/exact columns equal q183's
    * row-for-row — while the word table recovers the |users|/32 bound
    * (spec-gated: every n_words ≤ ceil(N/32), a bound the raw sparse
    * packing provably blows).
    *
    * Scale shape: the dictionary is |distinct users|-sized (built at
    * ingest in a real deployment, alongside the signature/lexical
    * stores); the remap is one equi-join of events against it; the rank
    * itself needs no global sort — per-bucket windows plus ≤256 collected
    * count rows. Everything downstream is q183's map-side-combinable
    * word build unchanged.
    */
  def q243BitmapSparse(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables(spark, dir, "events")
      .select(col("event_type"), col("ts"),
        (col("user_id") * lit(Q243Spread) + lit(7L)).as("sid"))
    val dict = denseDict(s.select(col("sid")).distinct(), "sid")
    val cells = s.join(dict, Seq("sid"))
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("day"),
        expr("did div 32").as("word"),
        expr("CAST(did % 32 AS INT)").as("bit"))
      .distinct()
    bitmapRolled(bitmapWords(cells), cells)
  }

  /** q187 — the q183 bitmap build accumulated as STREAMING STATE: the
    * daily word `bit_or` runs as a complete-mode streaming aggregation
    * over ≥ 3 real micro-batches (one file each), so the state store IS
    * the exact bitmap cube — OR-monotone like q143's CMS counters, but
    * EXACT, and needing no upstream dedup state because OR is idempotent
    * (a replayed record sets bits that are already set). The window roll
    * and exact rider then run batch-side over the streamed words via the
    * same [[bitmapRolled]] the batch build uses, and the output reuses
    * q183's oracle VERBATIM — how the words accumulated is invisible to
    * the answer, which is the mergeable-exact-structure claim stated as
    * an executable equality.
    */
  def q187StreamingBitmap(spark: SparkSession, dir: String): DataFrame = {
    val fix = ReplayFixtures.ensure(dir, "q187", Seq("events")) { root =>
      Tables(spark, dir, "events").repartition(3).write.parquet(s"$root/in")
    }
    val base = ReplayFixtures.runRoot(dir, "q187")
    val ss = ReplayFixtures.replaySession(spark)
    val e = Tables(ss, dir, "events")
    val stream = graft.streaming.EventStream
      .readEventStream(ss, s"$fix/in", maxFilesPerTrigger = 1)
    val view = "graft_q187_bm_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    val q = bitmapWords(bitmapCells(stream)).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(view)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    // dump the final streamed state to parquet and read back: (a) the roll
    // self-joins the word table, and MemoryPlan leaves conflicting
    // attribute ids across the two scans; (b) a persisted state table is
    // the production artifact anyway (the bitmap cube a dashboard reads)
    ss.table(view).write.mode("overwrite").parquet(s"$base/state")
    bitmapRolled(ss.read.parquet(s"$base/state"), bitmapCells(e).distinct())
  }

  val q183Sql: String =
    """WITH pres AS (
      |  SELECT DISTINCT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
      |    user_id // 32 AS word, CAST(user_id % 32 AS INT) AS bit
      |  FROM events),
      |bm AS (
      |  SELECT event_type, day, word, bit_or(1::BIGINT << bit) AS bits
      |  FROM pres GROUP BY 1, 2, 3),
      |ends AS (SELECT DISTINCT event_type, day AS end_day FROM bm),
      |rolled AS (
      |  SELECT b.event_type, e.end_day, b.word, bit_or(b.bits) AS bits
      |  FROM bm b JOIN ends e
      |    ON e.event_type = b.event_type AND b.day BETWEEN e.end_day - 6 AND e.end_day
      |  GROUP BY 1, 2, 3),
      |agg AS (
      |  SELECT event_type, end_day, CAST(count(*) AS BIGINT) AS n_words,
      |    CAST(sum(bit_count(bits)) AS BIGINT) AS bitmap_distinct
      |  FROM rolled GROUP BY 1, 2),
      |ex AS (
      |  SELECT p.event_type, e.end_day,
      |    CAST(count(DISTINCT p.word * 32 + p.bit) AS BIGINT) AS exact_distinct
      |  FROM pres p JOIN ends e
      |    ON e.event_type = p.event_type AND p.day BETWEEN e.end_day - 6 AND e.end_day
      |  GROUP BY 1, 2)
      |SELECT a.event_type, a.end_day, a.n_words, a.bitmap_distinct, x.exact_distinct
      |FROM agg a JOIN ex x ON x.event_type = a.event_type AND x.end_day = a.end_day
      |ORDER BY a.event_type, a.end_day""".stripMargin

  /** q183's oracle with the presence cells built from the DICTIONARY
    * remap of the sparsified ids — the two-level Spark rank restates as
    * one global `row_number() OVER (ORDER BY sid)`.
    */
  val q243Sql: String =
    s"""WITH s AS (
      |  SELECT event_type, ts, user_id * $Q243Spread + 7 AS sid FROM events),
      |d AS (
      |  SELECT sid, row_number() OVER (ORDER BY sid) - 1 AS did
      |  FROM (SELECT DISTINCT sid FROM s)),
      |pres AS (
      |  SELECT DISTINCT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
      |    did // 32 AS word, CAST(did % 32 AS INT) AS bit
      |  FROM s JOIN d USING (sid)),
      |bm AS (
      |  SELECT event_type, day, word, bit_or(1::BIGINT << bit) AS bits
      |  FROM pres GROUP BY 1, 2, 3),
      |ends AS (SELECT DISTINCT event_type, day AS end_day FROM bm),
      |rolled AS (
      |  SELECT b.event_type, e.end_day, b.word, bit_or(b.bits) AS bits
      |  FROM bm b JOIN ends e
      |    ON e.event_type = b.event_type AND b.day BETWEEN e.end_day - 6 AND e.end_day
      |  GROUP BY 1, 2, 3),
      |agg AS (
      |  SELECT event_type, end_day, CAST(count(*) AS BIGINT) AS n_words,
      |    CAST(sum(bit_count(bits)) AS BIGINT) AS bitmap_distinct
      |  FROM rolled GROUP BY 1, 2),
      |ex AS (
      |  SELECT p.event_type, e.end_day,
      |    CAST(count(DISTINCT p.word * 32 + p.bit) AS BIGINT) AS exact_distinct
      |  FROM pres p JOIN ends e
      |    ON e.event_type = p.event_type AND p.day BETWEEN e.end_day - 6 AND e.end_day
      |  GROUP BY 1, 2)
      |SELECT a.event_type, a.end_day, a.n_words, a.bitmap_distinct, x.exact_distinct
      |FROM agg a JOIN ex x ON x.event_type = a.event_type AND x.end_day = a.end_day
      |ORDER BY a.event_type, a.end_day""".stripMargin

  /** Register count (m=2^6) and the integral HLL estimate numerator
    * alpha_64 · m² · 2^27 scaled ×1000 against a ×1000 denominator:
    * 709 · 4096 · 134217728 — ONE definition interpolated into both
    * engines so the arithmetic cannot drift.
    */
  private[graft] val HllM = 64
  private[graft] val HllAlphaNum = 709L * 4096L * 134217728L

  /** q177 — HyperLogLog distinct-count registers (Flajolet et al. 2007),
    * the third leg of the sketch family: where KMV (q136) keeps k order
    * statistics and CMS (q137) keeps counters, HLL keeps m=64 one-byte
    * registers — CONSTANT state per group regardless of cardinality, and
    * merging two shards' registers is an elementwise max, the cheapest
    * merge of the three. Hash is the engine's md5 family truncated to 32
    * bits: top 6 bits pick the register, the position of the first set
    * bit in the remaining 26 estimates log2(n/m) per register.
    *
    * Everything stays integral so DuckDB restates the sketch bit-for-bit:
    * rho is a string `instr` over the lpad'ed binary expansion (both
    * engines' `bin` drops leading zeros identically), and the harmonic
    * mean runs in units of 2^-27 — z_num = Σ 2^(27-rho) with empty
    * registers contributing 2^27 — so the raw estimate is one 64-bit
    * integer division alpha·m²·2^27·1000⁻¹ div z_num (max z_num is
    * 64·2^27·1000 < 2^43; the numerator is 3.9e14 < 2^49). The
    * small-range linear-counting correction needs a transcendental ln
    * that cannot cross engines exactly, so the row carries n_empty and
    * the exact count instead — the reader applies any correction they
    * like, and the registers themselves are proven.
    *
    * Scale: the register build is one map-side-combinable max-aggregate
    * over (group, bucket) — 64 rows per group cross the exchange; at
    * 100 TB the per-day register tables union by elementwise max into
    * any date range's sketch without touching raw data (same mergeable
    * contract as q151's rolling KMV).
    */
  /** The q177 register build over any (event_type, user_id) frame —
    * factored out so SketchSpec can prove shard registers max-merge to
    * exactly the global registers.
    */
  private[graft] def hllRegisters(e: DataFrame): DataFrame =
    e.select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h32"))
      .distinct()
      .withColumn("rest", expr("h32 % 67108864"))
      .withColumn("rho",
        when(instr(lpad(bin(col("rest")), 26, "0"), "1") === 0, lit(27))
          .otherwise(instr(lpad(bin(col("rest")), 26, "0"), "1")))
      .groupBy(col("event_type"), expr("h32 div 67108864").as("bucket"))
      .agg(max(col("rho")).as("rho"))

  def q177HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val z = hllRegisters(e).groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_used"),
        (lit(HllM.toLong) - count(lit(1))).as("n_empty"),
        (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(27 - rho AS INT))")) +
          (lit(HllM.toLong) - count(lit(1))) * lit(134217728L)).as("z_num"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    z.join(exact, "event_type")
      .select(col("event_type"), col("n_used"), col("n_empty"), col("z_num"),
        expr(s"$HllAlphaNum div (1000 * z_num)").as("est_hll"),
        col("exact_distinct"))
      .orderBy(col("event_type"))
  }

  val q177Sql: String =
    s"""WITH h AS (
      |  SELECT DISTINCT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h32
      |  FROM events),
      |reg AS (
      |  SELECT event_type, h32 // 67108864 AS bucket,
      |    max(CASE WHEN strpos(lpad(bin(h32 % 67108864), 26, '0'), '1') = 0 THEN 27
      |             ELSE strpos(lpad(bin(h32 % 67108864), 26, '0'), '1') END) AS rho
      |  FROM h GROUP BY 1, 2),
      |z AS (
      |  SELECT event_type,
      |    CAST(count(*) AS BIGINT) AS n_used,
      |    CAST($HllM - count(*) AS BIGINT) AS n_empty,
      |    CAST(sum(1::BIGINT << CAST(27 - rho AS INT)) +
      |      ($HllM - count(*)) * 134217728 AS BIGINT) AS z_num
      |  FROM reg GROUP BY 1),
      |ex AS (
      |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      |  FROM events GROUP BY 1)
      |SELECT event_type, n_used, n_empty, z_num,
      |  $HllAlphaNum // (1000 * z_num) AS est_hll, exact_distinct
      |FROM z JOIN ex USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** q141 — KMV set algebra (theta-sketch-style union/intersection over
    * the q136 sketches), Beyer et al. 2007 / Dasgupta et al. 2016: for
    * every event-type pair, merge the two k-min sketches by
    * union-then-truncate to the k=8 smallest distinct hashes — the merged
    * sketch is EXACTLY the KMV sketch of the union, so
    * est_union = (k−1)·2^60 div h_k as in q136. Intersection uses the
    * ratio estimator: of the union's k-mins, count those present in BOTH
    * input sketches; est_intersect = matches·est_union div k. Membership
    * needs only the input SKETCHES, not the full sets: a hash among the k
    * smallest of A∪B that belongs to A is necessarily among the k smallest
    * of A (fewer than k union hashes below it ⇒ fewer than k of A's).
    *
    * This is why mergeable sketches matter at 100 TB: audience overlap
    * across N segments needs only the N·k-hash sketch table — the
    * pairwise stage never rescans the corpus. The exact union/intersection
    * counts ride along (one distinct-pairs frame) so every row exhibits
    * its own estimate-vs-truth gap; at scale you'd drop the exact half.
    * All arithmetic is integral — the oracle restates the sketch
    * bit-for-bit.
    */
  def q141KmvSetOps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val h = e.select(col("event_type"), md5_60(col("user_id")).as("h"))
      .distinct()
    val mins = kMins(h, "event_type")
    val types = mins.select(col("event_type")).distinct()
    val tp = types.as("l")
      .join(types.as("r"), col("l.event_type") < col("r.event_type"))
      .select(col("l.event_type").as("type_a"), col("r.event_type").as("type_b"))
    def tagged(src: Int, side: String) = tp
      .join(mins.withColumnRenamed("event_type", side), Seq(side))
      .select(col("type_a"), col("type_b"), col("h"), lit(src).as("src"))
    val merged = tagged(1, "type_a").unionByName(tagged(2, "type_b"))
      .groupBy(col("type_a"), col("type_b"), col("h"))
      .agg(max(when(col("src") === 1, 1).otherwise(0)).as("in_a"),
        max(when(col("src") === 2, 1).otherwise(0)).as("in_b"))
    val sk = kMins(merged, "type_a", "type_b")
      .groupBy(col("type_a"), col("type_b"))
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("k_eff"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("k_matches"))
      .withColumn("est_union", kmvEstimate(col("k_eff")))
      // below k the merged sketch IS the exact hash-set union, so
      // k_matches is the exact intersection — no scaling. Division runs
      // BEFORE the multiply: est_union can reach ~7·2^60 when kth_hash is
      // pathologically small, and k_matches·est_union would wrap a Long
      // (silently here, loudly in DuckDB — the engines would diverge);
      // (est_union div k)·k_matches stays under 2^63 and loses at most
      // k−1 per factor of precision.
      .withColumn("est_intersect",
        when(col("k_eff") === KmvK.toLong,
          expr(s"est_union div $KmvK * k_matches"))
          .otherwise(col("k_matches")))
    val dtu = e.select(col("event_type"), col("user_id")).distinct()
    def utagged(src: Int, side: String) = tp
      .join(dtu.withColumnRenamed("event_type", side), Seq(side))
      .select(col("type_a"), col("type_b"), col("user_id"), lit(src).as("src"))
    val ex = utagged(1, "type_a").unionByName(utagged(2, "type_b"))
      .groupBy(col("type_a"), col("type_b"), col("user_id"))
      .agg(max(when(col("src") === 1, 1).otherwise(0)).as("in_a"),
        max(when(col("src") === 2, 1).otherwise(0)).as("in_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("exact_intersect"))
    sk.join(ex, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("k_matches"),
        col("est_union"), col("est_intersect"),
        col("exact_union"), col("exact_intersect"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val q141Sql: String =
    s"""WITH h AS (
      |  SELECT DISTINCT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |  FROM h),
      |mins AS (SELECT event_type, h FROM r WHERE rn <= $KmvK),
      |tp AS (
      |  SELECT l.event_type AS type_a, r2.event_type AS type_b
      |  FROM (SELECT DISTINCT event_type FROM mins) l
      |  JOIN (SELECT DISTINCT event_type FROM mins) r2
      |    ON l.event_type < r2.event_type),
      |m AS (
      |  SELECT type_a, type_b, h,
      |    max(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS in_a,
      |    max(CASE WHEN src = 2 THEN 1 ELSE 0 END) AS in_b
      |  FROM (
      |    SELECT tp.type_a, tp.type_b, mins.h, 1 AS src
      |    FROM tp JOIN mins ON mins.event_type = tp.type_a
      |    UNION ALL
      |    SELECT tp.type_a, tp.type_b, mins.h, 2 AS src
      |    FROM tp JOIN mins ON mins.event_type = tp.type_b)
      |  GROUP BY type_a, type_b, h),
      |u AS (
      |  SELECT *, row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
      |  FROM m),
      |sk AS (
      |  SELECT type_a, type_b, max(h) AS kth_hash,
      |    CAST(count(*) AS BIGINT) AS k_eff,
      |    CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS k_matches
      |  FROM u WHERE rn <= $KmvK GROUP BY type_a, type_b),
      |est AS (
      |  SELECT type_a, type_b, k_matches,
      |    CASE WHEN k_eff = $KmvK THEN $KmvNum // kth_hash
      |         ELSE k_eff END AS est_union,
      |    CASE WHEN k_eff = $KmvK
      |         THEN ($KmvNum // kth_hash) // $KmvK * k_matches
      |         ELSE k_matches END AS est_intersect
      |  FROM sk),
      |dtu AS (SELECT DISTINCT event_type, user_id FROM events),
      |exm AS (
      |  SELECT type_a, type_b, user_id,
      |    max(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS in_a,
      |    max(CASE WHEN src = 2 THEN 1 ELSE 0 END) AS in_b
      |  FROM (
      |    SELECT tp.type_a, tp.type_b, d.user_id, 1 AS src
      |    FROM tp JOIN dtu d ON d.event_type = tp.type_a
      |    UNION ALL
      |    SELECT tp.type_a, tp.type_b, d.user_id, 2 AS src
      |    FROM tp JOIN dtu d ON d.event_type = tp.type_b)
      |  GROUP BY type_a, type_b, user_id),
      |ex AS (
      |  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS exact_union,
      |    CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS exact_intersect
      |  FROM exm GROUP BY type_a, type_b)
      |SELECT e.type_a, e.type_b, k_matches, est_union, est_intersect,
      |  exact_union, exact_intersect
      |FROM est e JOIN ex USING (type_a, type_b)
      |ORDER BY type_a, type_b""".stripMargin

  /** q143 — the CMS built as STREAMING STATE: the same d×w counter table
    * as q137, but accumulated by a watermark-free streaming aggregation
    * over ≥ 2 real micro-batches (maxFilesPerTrigger=1 over a 3-file
    * fixture), complete-mode to a memory sink. Because CMS counters only
    * ADD, the streaming state store IS the sketch — each micro-batch folds
    * its partial counts into 256 rows of state, which is why a sketch can
    * summarize an unbounded stream in bounded memory (the whole point of
    * CMS in production telemetry). The final probe (same top-5 heavy
    * hitters, same broadcast join) must equal q137's batch answer
    * bit-for-bit — so this row REUSES q137's oracle SQL verbatim: how the
    * counters were accumulated is invisible to the sketch.
    */
  def q143StreamingCms(spark: SparkSession, dir: String): DataFrame = {
    val fix = ReplayFixtures.ensure(dir, "q143", Seq("events")) { root =>
      Tables(spark, dir, "events").repartition(3).write.parquet(s"$root/in")
    }
    val base = ReplayFixtures.runRoot(dir, "q143")
    val ss = ReplayFixtures.replaySession(spark)
    val e = Tables(ss, dir, "events")
    val stream = graft.streaming.EventStream
      .readEventStream(ss, s"$fix/in", maxFilesPerTrigger = 1)
    val view = "graft_q143_cms_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    val q = cmsCounters(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(view)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val top = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("user_id"))
      .limit(5)
    cmsEstimate(top, ss.table(view))
      .orderBy(col("true_cnt").desc, col("user_id"))
  }

  /** q151 — ROLLING-WINDOW distinct via merged DAILY sketches: build one
    * KMV sketch per day (k=8 smallest distinct user hashes), then answer
    * every 7-day window by merging its ≤7 daily sketches
    * (union-then-truncate) — the production pattern behind "pre-aggregate
    * daily sketch tables, answer ANY window without rescanning events".
    * Sound because a hash among the window's k smallest is among its own
    * day's k smallest, so the union of daily sketches always contains the
    * window's true k-mins (same argument as q141's set algebra, applied
    * across time instead of across segments). The exact 7-day rolling
    * distinct (q117's shape) rides along as truth.
    *
    * Scale: the merge stage touches only days×k sketch rows — re-answering
    * a quarter of windows over a year of 100 TB events is a 365×8-row job;
    * the exact rider is the expensive half and exists only to exhibit the
    * gap. SketchSpec proves the merge identity: merged-daily == built
    * directly from each window's full hash set, bit-for-bit.
    */
  def q151RollingKmv(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val dh = e.select(to_date(col("ts")).as("d"), md5_60(col("user_id")).as("h"))
      .distinct()
    val maxDay = dh.agg(max(col("d")).as("max_d"))
    val daily = kMins(dh, "d")
    val merged = daily.crossJoin(broadcast(maxDay))
      .withColumn("day", explode(expr(
        "sequence(d, least(date_add(d, 6), max_d), interval 1 day)")))
      .select(col("day"), col("h")).distinct()
    val sk = kMins(merged, "day")
      .groupBy(col("day"))
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("n_mins"))
    val exact = e.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .crossJoin(broadcast(maxDay))
      .withColumn("day", explode(expr(
        "sequence(d, least(date_add(d, 6), max_d), interval 1 day)")))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("exact_wau"))
    sk.join(exact, Seq("day"))
      .select(col("day"), col("n_mins"),
        kmvEstimate(col("n_mins")).as("est_wau"),
        col("exact_wau"))
      .orderBy(col("day"))
  }

  val q151Sql: String =
    s"""WITH dh AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS d,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |m AS (SELECT max(d) AS max_d FROM dh),
      |daily AS (
      |  SELECT d, h FROM (
      |    SELECT d, h, row_number() OVER (PARTITION BY d ORDER BY h) AS rn
      |    FROM dh)
      |  WHERE rn <= $KmvK),
      |win AS (
      |  SELECT DISTINCT CAST(day AS DATE) AS day, h FROM (
      |    SELECT h, unnest(range(d, least(d + 7, max_d + 1), INTERVAL 1 DAY)) AS day
      |    FROM daily, m)),
      |sk AS (
      |  SELECT day, max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS n_mins
      |  FROM (
      |    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
      |    FROM win)
      |  WHERE rn <= $KmvK GROUP BY day),
      |ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |ex AS (
      |  SELECT CAST(day AS DATE) AS day,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_wau
      |  FROM (
      |    SELECT user_id, unnest(range(d, least(d + 7, max_d + 1), INTERVAL 1 DAY)) AS day
      |    FROM ud, m)
      |  GROUP BY 1)
      |SELECT s.day, n_mins,
      |  CASE WHEN n_mins = $KmvK THEN $KmvNum // kth_hash
      |       ELSE n_mins END AS est_wau,
      |  exact_wau
      |FROM sk s JOIN ex USING (day)
      |ORDER BY day""".stripMargin

  /** Sample size for q153's coordinated quantile sample. */
  private[graft] val SampleK = 64

  /** q153 — quantile estimation from a COORDINATED bottom-k-by-hash row
    * sample (Cohen 1997 / Cohen–Kaplan 2007 coordinated sampling): per
    * event_type, the 64 rows with the smallest md5_60(event_id) are a
    * deterministic uniform sample (the hash is the permutation), and the
    * sample's percentile_disc estimates the population's. The same
    * union-then-truncate argument as KMV makes the sample MERGEABLE: a
    * row among a group's global bottom-64 is among its own shard's
    * bottom-64, so shard samples re-top-k to exactly the global sample
    * (SketchSpec proves the identity on an event_id-parity split). This is
    * the deterministic, oracle-able analogue of a KLL/t-digest quantile
    * sketch — and unlike those, bit-restatable in DuckDB.
    *
    * Estimates and truth are both percentile_disc (an ELEMENT of the
    * data, picked by rank — no interpolation arithmetic), so every value
    * crosses engines exactly; the exact side ranks the full partition and
    * is the expensive half, riding along only to exhibit the gap.
    */
  def q153SampleQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val h = e.select(col("event_type"), col("value"), md5_60(col("event_id")).as("h"))
    def disc(df: DataFrame, prefix: String): DataFrame = {
      val wv = Window.partitionBy(col("event_type")).orderBy(col("value"), col("h"))
      val wn = Window.partitionBy(col("event_type"))
      df.withColumn("vrn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("event_type"))
        .agg(
          max(when(col("vrn") === expr("CAST(ceil(n * 0.5) AS BIGINT)"), col("value")))
            .as(s"${prefix}_p50"),
          max(when(col("vrn") === expr("CAST(ceil(n * 0.9) AS BIGINT)"), col("value")))
            .as(s"${prefix}_p90"),
          count(lit(1)).as(s"${prefix}_n"))
    }
    disc(bottomK(h, SampleK, "event_type"), "est")
      .join(disc(h, "exact"), Seq("event_type"))
      .orderBy(col("event_type"))
  }

  val q153Sql: String =
    s"""WITH h AS (
      |  SELECT event_type, value,
      |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |samp AS (
      |  SELECT event_type, value, h FROM (
      |    SELECT event_type, value, h,
      |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |    FROM h)
      |  WHERE rn <= $SampleK),
      |est AS (
      |  SELECT event_type,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS est_p50,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS est_p90,
      |    CAST(count(*) AS BIGINT) AS est_n
      |  FROM (
      |    SELECT event_type, value,
      |      row_number() OVER (PARTITION BY event_type ORDER BY value, h) AS vrn,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM samp)
      |  GROUP BY event_type),
      |ex AS (
      |  SELECT event_type,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS exact_p50,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS exact_p90,
      |    CAST(count(*) AS BIGINT) AS exact_n
      |  FROM (
      |    SELECT event_type, value,
      |      row_number() OVER (PARTITION BY event_type ORDER BY value, h) AS vrn,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM h)
      |  GROUP BY event_type)
      |SELECT event_type, est_p50, est_p90, est_n, exact_p50, exact_p90, exact_n
      |FROM est JOIN ex USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** q194 — ROLLING-WINDOW quantiles from MERGED DAILY coordinated
    * samples: q153's bottom-k-by-hash quantile sample, maintained the
    * q151 way. One pass builds a (event_type, day) sample table — the 64
    * rows with the smallest md5_60(event_id) per group — and every 7-day
    * window is then answered by unioning its ≤7 daily samples and
    * re-taking the bottom 64: a row among a window's global bottom-64 is
    * among its own day's bottom-64, so the merge reconstructs the
    * window's true coordinated sample EXACTLY (SketchSpec proves the
    * identity against a direct build), and the window's p50/p90 are
    * percentile_disc over that sample — elements of the data, bit-equal
    * across engines. The exact per-window quantiles ride along as truth,
    * computed by exploding each row to the windows it covers.
    *
    * Scale: the daily sample table is |types|·|days|·64 rows — answering
    * a quarter's windows over a year of 100 TB events re-ranks
    * 365·|types|·64 sample rows, no event rescans. The exact rider exists
    * only to exhibit the estimate's error, and is itself maintained the
    * daily-artifact way: ONE day-keyed pass builds a VALUE HISTOGRAM per
    * (type, day) — distinct-value-sized, mergeable by summing counts —
    * and each window merges its ≤7 day histograms and locates the ranks
    * from cumulative counts instead of re-exploding and re-ranking the
    * full event stream per window end — the q151/q183 "merge daily
    * artifacts, never rescan rows" economics, with no per-group array
    * buffer anywhere (the ExactQuantiles route that cured q19/q74).
    */
  def q194RollingQuantiles(spark: SparkSession, dir: String): DataFrame = {
    // the ×7 window-end explode (and the per-row md5 under it) is fan-out
    // work inside the scan stage — rebalance a below-core-count scan
    val e = graft.operators.Fanout.rebalance(Tables(spark, dir, "events"))
    val h = e.select(col("event_type"), to_date(col("ts")).as("d"),
      col("value"), md5_60(col("event_id")).as("h"))
    val maxDay = h.agg(max(col("d")).as("max_d"))
    def windowEnds(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(maxDay))
      .withColumn("end_day", explode(expr(
        "sequence(d, least(date_add(d, 6), max_d), interval 1 day)")))
    def disc(df: DataFrame, prefix: String): DataFrame = {
      val wv = Window.partitionBy(col("event_type"), col("end_day"))
        .orderBy(col("value"), col("h"))
      val wn = Window.partitionBy(col("event_type"), col("end_day"))
      df.withColumn("vrn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("event_type"), col("end_day"))
        .agg(
          max(when(col("vrn") === expr("CAST(ceil(n * 0.5) AS BIGINT)"), col("value")))
            .as(s"${prefix}_p50"),
          max(when(col("vrn") === expr("CAST(ceil(n * 0.9) AS BIGINT)"), col("value")))
            .as(s"${prefix}_p90"),
          count(lit(1)).as(s"${prefix}_n"))
    }
    val daily = bottomK(h, SampleK, "event_type", "d")
    val merged = bottomK(
      windowEnds(daily).select(col("event_type"), col("end_day"), col("value"), col("h")),
      SampleK, "event_type", "end_day")
    // exact side from per-day VALUE HISTOGRAMS (the q19/q74
    // ExactQuantiles route): percentile_disc at rank r ordered by
    // (value, h) returns the r-th smallest VALUE — ties reorder rows,
    // never which value occupies a rank — so the order statistic falls
    // out of cumulative histogram counts. Day histograms are
    // distinct-value-sized, merge across the ≤7-day window by summing
    // counts, and no aggregation buffer ever holds more than a running
    // count (the window sorts are spillable) — the former day-run
    // collect_list/flatten cell (and the 2^31 assert_true ceiling it
    // needed) is gone.
    val dayHist = h.groupBy(col("event_type"), col("d"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    val winHist = windowEnds(dayHist)
      .groupBy(col("event_type"), col("end_day"), col("value"))
      .agg(sum(col("cnt")).as("cnt"))
    val wCum = Window.partitionBy(col("event_type"), col("end_day"))
      .orderBy(col("value"))
    val wAll = Window.partitionBy(col("event_type"), col("end_day"))
    val exact = winHist
      .withColumn("_cum", sum(col("cnt")).over(wCum))
      .withColumn("_n", sum(col("cnt")).over(wAll))
      .groupBy(col("event_type"), col("end_day"))
      .agg(
        min(when(col("_cum") >= expr("ceil(_n * 0.5)"), col("value")))
          .as("exact_p50"),
        min(when(col("_cum") >= expr("ceil(_n * 0.9)"), col("value")))
          .as("exact_p90"),
        max(col("_n")).as("exact_n"))
    disc(merged, "est")
      .join(exact, Seq("event_type", "end_day"))
      .orderBy(col("event_type"), col("end_day"))
  }

  val q194Sql: String =
    s"""WITH h AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, value,
      |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |m AS (SELECT max(d) AS max_d FROM h),
      |daily AS (
      |  SELECT event_type, d, value, h FROM (
      |    SELECT event_type, d, value, h,
      |      row_number() OVER (PARTITION BY event_type, d ORDER BY h) AS rn
      |    FROM h)
      |  WHERE rn <= $SampleK),
      |dwin AS (
      |  SELECT event_type, CAST(end_day AS DATE) AS end_day, value, h FROM (
      |    SELECT event_type, value, h,
      |      unnest(range(d, least(d + 7, max_d + 1), INTERVAL 1 DAY)) AS end_day
      |    FROM daily, m)),
      |merged AS (
      |  SELECT event_type, end_day, value, h FROM (
      |    SELECT event_type, end_day, value, h,
      |      row_number() OVER (PARTITION BY event_type, end_day ORDER BY h) AS rn
      |    FROM dwin)
      |  WHERE rn <= $SampleK),
      |est AS (
      |  SELECT event_type, end_day,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS est_p50,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS est_p90,
      |    CAST(count(*) AS BIGINT) AS est_n
      |  FROM (
      |    SELECT event_type, end_day, value,
      |      row_number() OVER (PARTITION BY event_type, end_day ORDER BY value, h) AS vrn,
      |      count(*) OVER (PARTITION BY event_type, end_day) AS n
      |    FROM merged)
      |  GROUP BY 1, 2),
      |fwin AS (
      |  SELECT event_type, CAST(end_day AS DATE) AS end_day, value, h FROM (
      |    SELECT event_type, value, h,
      |      unnest(range(d, least(d + 7, max_d + 1), INTERVAL 1 DAY)) AS end_day
      |    FROM h, m)),
      |ex AS (
      |  SELECT event_type, end_day,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS exact_p50,
      |    max(CASE WHEN vrn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS exact_p90,
      |    CAST(count(*) AS BIGINT) AS exact_n
      |  FROM (
      |    SELECT event_type, end_day, value,
      |      row_number() OVER (PARTITION BY event_type, end_day ORDER BY value, h) AS vrn,
      |      count(*) OVER (PARTITION BY event_type, end_day) AS n
      |    FROM fwin)
      |  GROUP BY 1, 2)
      |SELECT event_type, end_day, est_p50, est_p90, est_n,
      |  exact_p50, exact_p90, exact_n
      |FROM est JOIN ex USING (event_type, end_day)
      |ORDER BY event_type, end_day""".stripMargin

  /** q156 — JOIN-SIZE ESTIMATION via the CMS inner product (Alon–Matias–
    * Szegedy 1996 frequency moments; Cormode–Muthukrishnan 2005 §4.2): the
    * size of an equi-join is Σ_k f_A(k)·f_B(k), and the bucket-wise inner
    * product of the two sides' CMS counter rows over-estimates it
    * (collisions only add cross terms), so min over the d hash rows is a
    * one-sided upper bound — the sketch-based cardinality estimate a
    * cost-based planner consults BEFORE running a join it might regret.
    * Sides: high-value events ⋈ click/view events on user_id. The exact
    * size rides along computed the scalable way (per-key frequency join,
    * never the materialized join — at sf0.1 the join itself would be ~10⁸
    * rows). Sketch path cost: two 256-int summaries + a 256-row join —
    * and the counters are the SAME mergeable tables q137/q143 build, so
    * per-day sketches answer any date-range join-size question later.
    * (At a true 100 TB side, widen w so bucket products stay under 2^63 —
    * the one dial this fixture doesn't need.)
    */
  def q156CmsJoinSize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val a = e.filter(col("value") > 0.5).select(col("user_id"))
    val b = e.filter(col("event_type").isin("click", "view")).select(col("user_id"))
    val prod = cmsCounters(a).as("x")
      .join(cmsCounters(b).as("y"),
        col("x.j") === col("y.j") && col("x.bucket") === col("y.bucket"))
      .groupBy(col("x.j"))
      .agg(sum(col("x.cnt") * col("y.cnt")).as("ip"))
      .agg(min(col("ip")).as("est_join_size"))
    val exact = a.groupBy(col("user_id")).agg(count(lit(1)).as("na"))
      .join(b.groupBy(col("user_id")).agg(count(lit(1)).as("nb")), Seq("user_id"))
      .agg(sum(col("na") * col("nb")).as("exact_join_size"))
    prod.crossJoin(exact)
  }

  val q156Sql: String =
    """WITH ha AS (
      |  SELECT user_id,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h1,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 17, 13))::BIGINT AS h2
      |  FROM events WHERE value > 0.5),
      |hb AS (
      |  SELECT user_id,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h1,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 17, 13))::BIGINT AS h2
      |  FROM events WHERE event_type IN ('click', 'view')),
      |j AS (SELECT unnest([0, 1, 2, 3]) AS j),
      |ca AS (
      |  SELECT j, (h1 + j * h2) % 64 AS bucket, CAST(count(*) AS BIGINT) AS cnt
      |  FROM ha CROSS JOIN j GROUP BY j, bucket),
      |cb AS (
      |  SELECT j, (h1 + j * h2) % 64 AS bucket, CAST(count(*) AS BIGINT) AS cnt
      |  FROM hb CROSS JOIN j GROUP BY j, bucket),
      |ip AS (
      |  SELECT ca.j, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) AS ip
      |  FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
      |  GROUP BY ca.j),
      |est AS (SELECT min(ip) AS est_join_size FROM ip),
      |ex AS (
      |  SELECT CAST(sum(na * nb) AS BIGINT) AS exact_join_size FROM (
      |    SELECT user_id, CAST(count(*) AS BIGINT) AS na FROM ha GROUP BY user_id) fa
      |  JOIN (
      |    SELECT user_id, CAST(count(*) AS BIGINT) AS nb FROM hb GROUP BY user_id) fb
      |  USING (user_id))
      |SELECT est_join_size, exact_join_size FROM est, ex""".stripMargin

  /** q168 Bloom geometry: m bits as m/32 32-bit words in BIGINTs (the
    * sign-safe word width — a 1<<63 mask overflows differently across
    * engines), k hash probes from the shared md5-60 family.
    */
  private[graft] val Q168M = 4096
  private[graft] val Q168K = 3
  private[graft] val Q168Cutoff = "2001-06-01"

  /** q168 — BLOOM-FILTER membership prefilter with a false-positive
    * audit: build an (m=4096, k=3) Bloom filter over "customers with an
    * order since [[Q168Cutoff]]", probe every customer, and emit the
    * bloom-positive rows labeled actual vs false positive. This is the
    * join-prefilter pattern the engine's native runtime bloom gate
    * (PlanSpec) exercises inside Catalyst, surfaced as an EXPLICIT
    * mergeable sketch: word-level OR merges shards, so a 1000-executor
    * build is one map-side-combinable aggregation over ≤ m/32 rows of
    * state — and unlike Spark's `bloom_filter_agg` its md5 hash family
    * restates bit-for-bit in the oracle.
    *
    * Scale shape: the build shuffles only 128-word partials (bit_or
    * combines map-side); the finished filter is a ~1 KB frame BROADCAST
    * to the probe side, which therefore never shuffles — k word lookups
    * + a bitwise AND per probe row replace shuffling 10^9 probe rows
    * against 10^7 member keys. The exact-membership audit join runs only
    * over bloom HITS (the prefilter's own promise: negatives are
    * definite). The FP column is the m/k sizing evidence: at 10× members
    * with m fixed the filter saturates and the audit shows it — sizing
    * m with the corpus (or stacking filters per shard) is the deployment
    * rule, and this row is the measurement that enforces it.
    */
  def q168BloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    def posCol(j: Int, key: Column): Column =
      pmod(md5_60(concat(lit(s"$j:"), key.cast("string"))), lit(Q168M.toLong))
    val members = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(Q168Cutoff).cast("timestamp"))
      .select(col("o_custkey").as("key")).distinct()
    val words = members
      .select(explode(array((0 until Q168K).map(j => posCol(j, col("key"))): _*)).as("pos"))
      .select(expr("pos div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("mask"))
      .groupBy(col("word")).agg(expr("bit_or(mask)").as("bits"))
    val probed = (0 until Q168K).foldLeft(
        Tables(spark, dir, "customer").select(col("c_custkey"))
          .withColumns((0 until Q168K).map(j => s"p$j" -> posCol(j, col("c_custkey"))).toMap)) {
      (df, j) =>
        df.join(broadcast(words.select(col("word").as(s"w$j"), col("bits").as(s"b$j"))),
            expr(s"p$j div 32") === col(s"w$j"), "left")
          .withColumn(s"h$j", coalesce(
            expr(s"(b$j & shiftleft(CAST(1 AS BIGINT), CAST(p$j % 32 AS INT))) != 0"),
            lit(false)))
    }
    probed.filter(col("h0") && col("h1") && col("h2"))
      .join(members.withColumn("actual", lit(1)), col("c_custkey") === col("key"), "left")
      .select(col("c_custkey"), coalesce(col("actual"), lit(0)).as("actual"),
        (lit(1) - coalesce(col("actual"), lit(0))).as("false_pos"))
      .orderBy(col("c_custkey"))
  }

  val q168Sql: String = {
    def pos(j: Int, key: String) =
      s"('0x' || substr(md5('$j:' || CAST($key AS VARCHAR)), 1, 15))::BIGINT % $Q168M"
    s"""WITH members AS (
       |  SELECT DISTINCT o_custkey AS key FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '$Q168Cutoff'),
       |pos AS (
       |  SELECT ('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || CAST(key AS VARCHAR)), 1, 15))::BIGINT % $Q168M AS pos
       |  FROM members, (VALUES (0), (1), (2)) j(j)),
       |words AS (
       |  SELECT pos // 32 AS word,
       |    bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
       |  FROM pos GROUP BY 1),
       |p AS (
       |  SELECT c_custkey, ${pos(0, "c_custkey")} AS p0,
       |    ${pos(1, "c_custkey")} AS p1, ${pos(2, "c_custkey")} AS p2
       |  FROM customer),
       |h AS (
       |  SELECT c_custkey,
       |    coalesce((w0.bits & (1::BIGINT << CAST(p0 % 32 AS INT))) <> 0, FALSE) AS h0,
       |    coalesce((w1.bits & (1::BIGINT << CAST(p1 % 32 AS INT))) <> 0, FALSE) AS h1,
       |    coalesce((w2.bits & (1::BIGINT << CAST(p2 % 32 AS INT))) <> 0, FALSE) AS h2
       |  FROM p LEFT JOIN words w0 ON p0 // 32 = w0.word
       |         LEFT JOIN words w1 ON p1 // 32 = w1.word
       |         LEFT JOIN words w2 ON p2 // 32 = w2.word)
       |SELECT c_custkey, CAST(m.key IS NOT NULL AS INT) AS actual,
       |  CAST(m.key IS NULL AS INT) AS false_pos
       |FROM h LEFT JOIN members m ON h.c_custkey = m.key
       |WHERE h0 AND h1 AND h2 ORDER BY c_custkey""".stripMargin
  }

  /** q199 — approximate FUNCTIONAL-DEPENDENCY DISCOVERY, the column-level
    * profiling companion to q181's FK discovery: for each candidate
    * `det → dep` pair, measure how close the dependency is to holding with
    * the standard g3 error (Kivinen–Mannila / TANE): the minimum number of
    * rows to delete so det determines dep = n − Σ_det max_dep count. A key
    * column shows g3 = 0 (exact FD); a near-FD shows a small violation
    * count — the signal schema-inference, normalization advice, and
    * data-quality monitors all run on.
    *
    * Each candidate costs one (det, dep) count agg + one det-keyed re-agg
    * — both map-side combinable, keyed shuffles only, merged by UNION over
    * the candidate list (a constant). Nothing is row-pairwise and no state
    * exceeds |distinct det|; at 100 TB the candidate sweep is a handful of
    * aggregation passes over the scan, exactly how production profilers
    * (e.g. Deequ) run it.
    */
  def q199FdDiscovery(spark: SparkSession, dir: String): DataFrame = {
    def g3(df: DataFrame, table: String, det: String, dep: String): DataFrame =
      df.groupBy(col(det).as("d"), col(dep).as("p"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("d"))
        .agg(sum(col("c")).as("n_d"), max(col("c")).as("keep_d"),
          count(lit(1)).as("n_dep"))
        .agg(
          sum(col("n_d")).as("n_rows"),
          count(lit(1)).as("n_groups"),
          (sum(col("n_d")) - sum(col("keep_d"))).as("g3_violations"),
          max(col("n_dep")).as("max_deps_per_det"))
        .select(lit(table).as("table_name"), lit(det).as("det"),
          lit(dep).as("dep"), col("n_rows"), col("n_groups"),
          col("g3_violations"),
          (col("g3_violations") === 0L).as("holds_exactly"),
          expr("10000 * (n_rows - g3_violations) div n_rows").as("confidence_bp"))
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem")
    val cands = Seq(
      g3(o, "orders", "o_orderkey", "o_orderstatus"),   // key ⇒ exact
      g3(o, "orders", "o_custkey", "o_orderpriority"),  // near-random
      g3(o, "orders", "o_orderdate", "o_orderstatus"),
      g3(l, "lineitem", "l_orderkey", "l_returnflag"),
      g3(l, "lineitem", "l_partkey", "l_tax"),
      g3(l, "lineitem", "l_suppkey", "l_linestatus"))
    cands.reduce(_.unionByName(_))
      .orderBy(col("table_name"), col("det"), col("dep"))
  }

  val q199Sql: String = {
    def block(table: String, det: String, dep: String): String =
      s"""SELECT '$table' AS table_name, '$det' AS det, '$dep' AS dep,
         |  CAST(sum(n_d) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(n_d) - sum(keep_d) AS BIGINT) AS g3_violations,
         |  (sum(n_d) - sum(keep_d)) = 0 AS holds_exactly,
         |  CAST(10000 * (sum(n_d) - (sum(n_d) - sum(keep_d))) // sum(n_d) AS BIGINT) AS confidence_bp
         |FROM (
         |  SELECT d, sum(c) AS n_d, max(c) AS keep_d FROM (
         |    SELECT $det AS d, $dep AS p, count(*) AS c FROM $table GROUP BY 1, 2)
         |  GROUP BY d)""".stripMargin
    Seq(
      block("orders", "o_orderkey", "o_orderstatus"),
      block("orders", "o_custkey", "o_orderpriority"),
      block("orders", "o_orderdate", "o_orderstatus"),
      block("lineitem", "l_orderkey", "l_returnflag"),
      block("lineitem", "l_partkey", "l_tax"),
      block("lineitem", "l_suppkey", "l_linestatus"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, det, dep")
  }

  /** q210 — SOURCE-OVERLAP MATRIX via HLL register merges + inclusion-
    * exclusion: for every pair of document sources, estimate the shared
    * VOCABULARY |A∩B| from per-source HLL register sets alone —
    * est_intersect = est(A) + est(B) − est(A∪B), where the union's
    * registers are the ELEMENTWISE MAX of the two sources' registers (the
    * lossless HLL merge, Flajolet et al. 2007 §4). This is the audit a
    * curation team runs to find sources republishing each other's content:
    * KMV answers it by k-min membership (q141); HLL answers it from
    * constant 64-byte state per source — the variant that still works when
    * the per-source sketches were built by independent daily jobs and only
    * the registers were kept.
    *
    * Integral discipline: registers, z_num, and the estimate are exactly
    * the q177 arithmetic ([[hllRegisters]]'s shapes keyed by source;
    * [[HllAlphaNum]] interpolated into both engines); inclusion–exclusion
    * runs on the integral estimates with a `greatest(0, ·)` clamp (the
    * estimator can cross zero for near-disjoint sets — the clamp is part
    * of the published operator, not a fixture patch). The row carries the
    * EXACT intersection alongside, so the sketch error is auditable.
    *
    * Scale: per-source registers are m=64 rows — the pair blow-up is
    * sources²·64 sketch rows, never data-sized; the only corpus-keyed work
    * is the one distinct-(source, token) tokenize that feeds both the
    * registers and the exact check. At 100 TB with daily per-source
    * register tables, this whole matrix is a driver-sized job over
    * persisted sketches.
    */
  def q210HllOverlap(spark: SparkSession, dir: String): DataFrame = {
    import TextOps.{normText, wsTokens}
    val toks = Tables(spark, dir, "documents")
      .select(col("source"), explode(wsTokens(normText(col("text")))).as("tok"))
      .distinct()
    val reg = toks
      .select(col("source"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h32"))
      .distinct()
      .withColumn("rest", expr("h32 % 67108864"))
      .withColumn("rho",
        when(instr(lpad(bin(col("rest")), 26, "0"), "1") === 0, lit(27))
          .otherwise(instr(lpad(bin(col("rest")), 26, "0"), "1")))
      .groupBy(col("source"), expr("h32 div 67108864").as("bucket"))
      .agg(max(col("rho")).as("rho"))
    def estOf() = expr(s"$HllAlphaNum div (1000 * z_num)")
    def zAgg(grouped: org.apache.spark.sql.RelationalGroupedDataset) =
      grouped.agg(
        (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(27 - rho AS INT))")) +
          (lit(HllM.toLong) - count(lit(1))) * lit(134217728L)).as("z_num"))
    val est = zAgg(reg.groupBy(col("source")))
      .select(col("source"), estOf().as("est"))
    val srcs = reg.select(col("source")).distinct()
    // sources × sources: a deliberately tiny frame (handful of corpus
    // sources), broadcast — the same documented-tiny crossJoin class as
    // q181's cols×cols
    val pairs = srcs.select(col("source").as("src_a"))
      .crossJoin(broadcast(srcs.select(col("source").as("src_b"))))
      .filter(col("src_a") < col("src_b"))
    val regU = pairs.join(reg, col("source") === col("src_a"))
      .select(col("src_a"), col("src_b"), col("bucket"), col("rho"))
      .union(pairs.join(reg, col("source") === col("src_b"))
        .select(col("src_a"), col("src_b"), col("bucket"), col("rho")))
      .groupBy(col("src_a"), col("src_b"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
    val estU = zAgg(regU.groupBy(col("src_a"), col("src_b")))
      .select(col("src_a"), col("src_b"), estOf().as("est_union"))
    val exact = toks.select(col("source").as("src_a"), col("tok"))
      .join(toks.select(col("source").as("src_b"), col("tok")), "tok")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("exact_intersect"))
    estU
      .join(broadcast(est.select(col("source").as("src_a"), col("est").as("est_a"))), "src_a")
      .join(broadcast(est.select(col("source").as("src_b"), col("est").as("est_b"))), "src_b")
      .join(exact, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        col("est_union"),
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union"))
          .as("est_intersect"),
        coalesce(col("exact_intersect"), lit(0L)).as("exact_intersect"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q210Sql: String =
    s"""WITH t AS (
       |  SELECT DISTINCT source, unnest(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '')) AS tok
       |  FROM documents),
       |h AS (
       |  SELECT DISTINCT source, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h32 FROM t),
       |reg AS (
       |  SELECT source, h32 // 67108864 AS bucket,
       |    max(CASE WHEN strpos(lpad(bin(h32 % 67108864), 26, '0'), '1') = 0 THEN 27
       |             ELSE strpos(lpad(bin(h32 % 67108864), 26, '0'), '1') END) AS rho
       |  FROM h GROUP BY 1, 2),
       |z AS (
       |  SELECT source, CAST(sum(1::BIGINT << CAST(27 - rho AS INT)) +
       |      ($HllM - count(*)) * 134217728 AS BIGINT) AS z_num
       |  FROM reg GROUP BY 1),
       |est AS (SELECT source, $HllAlphaNum // (1000 * z_num) AS est FROM z),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM (SELECT DISTINCT source FROM reg) a
       |  JOIN (SELECT DISTINCT source FROM reg) b ON a.source < b.source),
       |regu AS (
       |  SELECT src_a, src_b, bucket, max(rho) AS rho FROM (
       |    SELECT p.src_a, p.src_b, r.bucket, r.rho
       |    FROM pairs p JOIN reg r ON r.source = p.src_a
       |    UNION ALL
       |    SELECT p.src_a, p.src_b, r.bucket, r.rho
       |    FROM pairs p JOIN reg r ON r.source = p.src_b)
       |  GROUP BY 1, 2, 3),
       |zu AS (
       |  SELECT src_a, src_b, CAST(sum(1::BIGINT << CAST(27 - rho AS INT)) +
       |      ($HllM - count(*)) * 134217728 AS BIGINT) AS z_num
       |  FROM regu GROUP BY 1, 2),
       |ex AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    CAST(count(*) AS BIGINT) AS exact_intersect
       |  FROM t a JOIN t b ON a.tok = b.tok AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT zu.src_a, zu.src_b, ea.est AS est_a, eb.est AS est_b,
       |  $HllAlphaNum // (1000 * zu.z_num) AS est_union,
       |  greatest(CAST(0 AS BIGINT), ea.est + eb.est - ($HllAlphaNum // (1000 * zu.z_num))) AS est_intersect,
       |  coalesce(ex.exact_intersect, CAST(0 AS BIGINT)) AS exact_intersect
       |FROM zu JOIN est ea ON ea.source = zu.src_a
       |  JOIN est eb ON eb.source = zu.src_b
       |  LEFT JOIN ex ON ex.src_a = zu.src_a AND ex.src_b = zu.src_b
       |ORDER BY zu.src_a, zu.src_b""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_hll_overlap" -> q210HllOverlap _,
    "q199_fd_discovery" -> q199FdDiscovery _,
    "q168_bloom_prefilter" -> q168BloomPrefilter _,
    "q177_hll_distinct" -> q177HllDistinct _,
    "q181_fk_discovery" -> q181FkDiscovery _,
    "q183_bitmap_distinct" -> q183BitmapDistinct _,
    "q243_bitmap_sparse" -> q243BitmapSparse _,
    "q187_streaming_bitmap" -> q187StreamingBitmap _,
    "q136_kmv_distinct" -> q136KmvDistinct _,
    "q137_cms_heavy_hitters" -> q137CmsHeavyHitters _,
    "q141_kmv_set_ops" -> q141KmvSetOps _,
    "q143_streaming_cms" -> q143StreamingCms _,
    "q151_rolling_kmv" -> q151RollingKmv _,
    "q153_sample_quantiles" -> q153SampleQuantiles _,
    "q194_rolling_quantiles" -> q194RollingQuantiles _,
    "q156_cms_join_size" -> q156CmsJoinSize _)

  val oracles: Map[String, String] = Map(
    "q210_hll_overlap" -> q210Sql,
    "q199_fd_discovery" -> q199Sql,
    "q168_bloom_prefilter" -> q168Sql,
    "q177_hll_distinct" -> q177Sql,
    "q181_fk_discovery" -> q181Sql,
    "q183_bitmap_distinct" -> q183Sql,
    "q243_bitmap_sparse" -> q243Sql,
    "q187_streaming_bitmap" -> q183Sql,
    "q136_kmv_distinct" -> q136Sql,
    "q137_cms_heavy_hitters" -> q137Sql,
    "q141_kmv_set_ops" -> q141Sql,
    "q143_streaming_cms" -> q137Sql,
    "q151_rolling_kmv" -> q151Sql,
    "q153_sample_quantiles" -> q153Sql,
    "q194_rolling_quantiles" -> q194Sql,
    "q156_cms_join_size" -> q156Sql)
}
