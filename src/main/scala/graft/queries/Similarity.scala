package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), pure `functions._` arithmetic (zip_with/aggregate are
  * codegen'd — no UDF in the scoring loop).
  *
  * Scale design: the query set is small and BROADCAST; the corpus streams
  * through one narrow scoring pass and a per-query top-k window. That is the
  * correct 1000-executor plan for brute force (no corpus shuffle at all —
  * the only shuffle is the top-k on the tiny query-id key). The LSH and IVF
  * variants then cut the scored fraction of the corpus, which is what makes
  * repeated querying cheap at 100 TB.
  */
object Similarity {

  /** Element-wise arithmetic in double (matches any double-based oracle). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(v: Column): Column = sqrt(dot(v, v))

  import graft.functions.ColFns.bound

  /** Unit-normalize: vector and its norm are lambda-bound so the norm's dot
    * product is computed once per row, not once per element.
    */
  def unitVec(v: Column): Column =
    bound(toDouble(v)) { d =>
      bound(sqrt(dot(d, d))) { n => transform(d, x => x / n) }
    }

  def cosine(a: Column, b: Column): Column =
    bound(toDouble(a)) { da =>
      bound(toDouble(b)) { db => dot(da, db) / (norm(da) * norm(db)) }
    }

  /** Deterministic random hyperplanes: `nBits` planes of dimension `dim`,
    * seeded — identical across executors/runs without any fitted state.
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Sign-random-projection bucket id (0 .. 2^nBits-1) as a narrow
    * projection: nBits dot products against literal plane vectors.
    */
  def withBucket(df: DataFrame, nBits: Int, vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val bucket = (0 until nBits).map { i =>
      val plane = array(planes(i).toIndexedSeq.map(lit): _*)
      when(dot(toDouble(col(vecCol)), plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** Hot-path cosine: the native codegen'd expression (VectorExpressions).
    * The HOF (`cosine`) variant above is kept for contexts without
    * registration; both compute identical doubles.
    */
  private def nativeCosine(spark: SparkSession)(a: Column, b: Column): Column = {
    graft.functions.VectorExpressions.register(spark)
    graft.functions.VectorExpressions.cosineSim(a, b)
  }

  private def queriesSet(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    Tables(spark, dir, "embeddings").filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  /** Brute-force exact cosine top-k: broadcast queries x corpus scan, then
    * top-5 per query (window on query_id).
    */
  def q50KnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables(spark, dir, "embeddings")
    val q = queriesSet(spark, dir)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), nativeCosine(spark)(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk").cast("long").as("rk"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  val q50Sql: String =
    """SELECT query_id, rk, neighbor_id, cosine FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_sum(list_transform(list_zip(q.embedding, c.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cosine,
      |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      list_sum(list_transform(list_zip(q.embedding, c.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC, c.vec_id) AS BIGINT) AS rk
      |  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
      |  JOIN embeddings c ON c.vec_id <> q.vec_id)
      |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** LSH-bucketed ANN: queries only score their own hyperplane bucket —
    * the scale path (scored fraction ~= 1/2^nBits). nBits is the
    * recall-vs-cost dial: more bits = smaller scored fraction and more
    * shuffle parallelism, lower recall (recall curve asserted in
    * QueriesSpec at two settings).
    */
  def knnLsh(spark: SparkSession, dir: String, nBits: Int): DataFrame = {
    val corpus = withBucket(Tables(spark, dir, "embeddings"), nBits = nBits)
    val q = withBucket(
      Tables(spark, dir, "embeddings").filter(col("vec_id") < 10), nBits = nBits)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), nativeCosine(spark)(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk").cast("long").as("rk"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  def q51KnnLsh(spark: SparkSession, dir: String): DataFrame =
    knnLsh(spark, dir, nBits = 4)

  /** IVF-style partitioned search: per-label centroids (the "coarse
    * quantizer" — here the given label clustering), each vector scored
    * against every centroid; emits the assignment + distance-to-own-centroid
    * — the build side of an IVF index, and a k-means assignment step.
    */
  def q52IvfAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
    // centroid per label: element-wise mean = posexplode + avg per (label, pos)
    val cent = e.select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("cx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("label").as("c_label"), transform(col("pairs"), p => p.getField("cx")).as("centroid"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("c_label"))
    e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("c_label"),
        cosine(col("embedding"), col("centroid")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("c_label").as("assigned_label"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("vec_id"))
  }

  /** IVF SEARCH — the complement of [[q52IvfAssign]]'s index build: each
    * query probes its `nprobe`=2 nearest centroids and scores ONLY those
    * label lists. At 100 TB this is the ANN scale path beyond LSH: the
    * corpus is partitioned (bucketed) by assigned label, so a probe reads
    * 2/k of the data; centroids and probe lists are tiny broadcasts.
    */
  def q54IvfSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
    val cent = e.select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("cx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("label").as("c_label"), transform(col("pairs"), p => p.getField("cx")).as("centroid"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("pcos").desc, col("c_label"))
    val probes = queriesSet(spark, dir)
      .crossJoin(broadcast(cent))
      .select(col("query_id"), col("q_emb"), col("c_label"),
        cosine(col("q_emb"), col("centroid")).as("pcos"))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= 2)
      .select(col("query_id"), col("q_emb"), col("c_label").as("label"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk").cast("long").as("rk"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  val q54Sql: String = {
    val pcos = cosineSql("q.embedding", "c.centroid")
    val cos = cosineSql("q.embedding", "e.embedding")
    s"""WITH cent AS (
       |  SELECT label, list(cx ORDER BY pos) AS centroid FROM (
       |    SELECT label, t.pos, avg(CAST(embedding[t.pos] AS DOUBLE)) AS cx
       |    FROM embeddings, range(1, 65) t(pos)
       |    GROUP BY label, t.pos)
       |  GROUP BY label),
       |probes AS (
       |  SELECT query_id, label FROM (
       |    SELECT q.vec_id AS query_id, c.label,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY $pcos DESC, c.label) AS prk
       |    FROM (SELECT * FROM embeddings WHERE vec_id < 10) q CROSS JOIN cent c)
       |  WHERE prk <= 2)
       |SELECT query_id, rk, neighbor_id, cosine FROM (
       |  SELECT p.query_id, e.vec_id AS neighbor_id,
       |    round($cos, 4) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY p.query_id ORDER BY $cos DESC, e.vec_id) AS BIGINT) AS rk
       |  FROM probes p
       |  JOIN embeddings e ON e.label = p.label
       |  JOIN embeddings q ON q.vec_id = p.query_id
       |  WHERE e.vec_id <> p.query_id)
       |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
  }

  /** Quantized brute-force ANN: corpus stored int8 (4x smaller), scored by
    * dequantized dot against unit-normalized queries — the memory-bound
    * regime's standard trade (recall loss <1%, rows-only check; top-1
    * agreement vs exact is asserted in QueriesSpec).
    */
  def q53KnnQuantized(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Quantize
    val corpus = Quantize.withQuantized(Tables(spark, dir, "embeddings"))
      .select(col("vec_id"), col("q_vec"), col("q_scale"))
    val q = queriesSet(spark, dir)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(Quantize.dequantize(col("q_vec"), col("q_scale")), toDouble(col("q_emb"))) /
          (sqrt(dot(Quantize.dequantize(col("q_vec"), col("q_scale")),
            Quantize.dequantize(col("q_vec"), col("q_scale")))) *
           norm(toDouble(col("q_emb"))))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk").cast("long").as("rk"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  // Shared oracle fragments. `dotSql` mirrors Spark's `dot` (left-fold over
  // zipped doubles — q50's exact-equality pass is the evidence the fold
  // orders agree); `bucketSql` re-derives the hyperplane bucket in SQL from
  // the SAME seeded plane values, embedded as literals via shortest
  // round-trip double formatting (parsing recovers the identical double).
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  private def normSql(v: String): String =
    s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  private def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  /** SQL expression for [[withBucket]]'s bucket id over column `v`. */
  def bucketSql(v: String, nBits: Int, dim: Int = 64): String = {
    val planes = hyperplanes(nBits, dim)
    (0 until nBits).map { i =>
      val lits = planes(i).map(_.toString).mkString("[", ", ", "]")
      s"(CASE WHEN ${dotSql(v, lits)} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  val q51Sql: String = {
    val cos = cosineSql("q.embedding", "c.embedding")
    s"""SELECT query_id, rk, neighbor_id, cosine FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round($cos, 4) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS BIGINT) AS rk
       |  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
       |  JOIN embeddings c
       |    ON c.vec_id <> q.vec_id
       |   AND ${bucketSql("c.embedding", 4)} = ${bucketSql("q.embedding", 4)})
       |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
  }

  val q52Sql: String = {
    val cos = cosineSql("e.embedding", "c.centroid")
    s"""WITH cent AS (
       |  SELECT label, list(cx ORDER BY pos) AS centroid FROM (
       |    SELECT label, t.pos, avg(CAST(embedding[t.pos] AS DOUBLE)) AS cx
       |    FROM embeddings, range(1, 65) t(pos)
       |    GROUP BY label, t.pos)
       |  GROUP BY label)
       |SELECT vec_id, label, assigned_label, cosine FROM (
       |  SELECT e.vec_id, e.label, c.label AS assigned_label,
       |    round($cos, 4) AS cosine,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c.label) AS rk
       |  FROM embeddings e CROSS JOIN cent c)
       |WHERE rk = 1 ORDER BY vec_id""".stripMargin
  }

  val q53Sql: String = {
    val dq = "c.dq"
    val cos = s"${dotSql(dq, "q.embedding")} / (${normSql(dq)} * ${normSql("q.embedding")})"
    s"""WITH cq AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(CAST(round(CAST(x AS DOUBLE) / s) AS TINYINT) AS DOUBLE) * s) AS dq
       |  FROM (SELECT vec_id, embedding,
       |          greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0 AS s
       |        FROM embeddings))
       |SELECT query_id, rk, neighbor_id, cosine FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round($cos, 4) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS BIGINT) AS rk
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) q
       |  JOIN cq c ON c.vec_id <> q.vec_id)
       |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
  }

  /** q55: MMR (maximal marginal relevance) diversity re-rank — the standard
    * two-stage retrieval tail: a cheap candidate stage (brute-force top-8
    * per query here; IVF/LSH at scale) followed by a greedy selection that
    * trades relevance against redundancy:
    * `mmr = lambda*rel - (1-lambda)*max(sim to already-selected)`.
    *
    * The greedy loop is UNROLLED to a fixed selection count (4), which is
    * what makes it a pure dataflow program: each step is one small join on
    * query_id (candidate sets are k-bounded per query, so the join input is
    * |queries| x k rows regardless of corpus size) plus one aggregation and
    * one row_number — and lets the oracle restate the exact same greedy
    * steps as chained CTEs. Ties break on vec_id in both engines, so the
    * selection is fully deterministic.
    */
  def q55MmrRerank(spark: SparkSession, dir: String): DataFrame = {
    // both weights as the same decimal literals the oracle uses: computing
    // (1 - 0.7) in Scala yields 0.30000000000000004, a DIFFERENT double
    // than the 0.3 literal DuckDB parses, and the score hash would drift
    val lam = 0.7
    val oneMinusLam = 0.3
    // snapshot so every block the greedy loop persists/checkpoints can be
    // released before returning — a long-lived session must not accumulate
    // candidate caches per invocation (r4 ADVICE)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val corpus = Tables(spark, dir, "embeddings")
    val q = queriesSet(spark, dir)
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("rel").desc, col("vec_id"))
    val cands = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("embedding"),
        nativeCosine(spark)(col("q_emb"), col("embedding")).as("rel"))
      .withColumn("crk", row_number().over(wTop))
      .filter(col("crk") <= 8)
      .select(col("query_id"), col("vec_id"), col("embedding"), col("rel"))
      .persist()
    val wPick = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    // step 1: pure relevance
    var selected = cands
      .withColumn("score", col("rel"))
      .withColumn("prk", row_number().over(wPick))
      .filter(col("prk") === 1)
      .select(col("query_id"), col("vec_id"), col("embedding"), lit(1L).as("sel_rk"), col("score"))
    var all = selected
    for (step <- 2 to 4) {
      val rem = cands.join(all.select(col("query_id"), col("vec_id")), Seq("query_id", "vec_id"), "left_anti")
      val scored = rem.as("r")
        .join(all.select(col("query_id"), col("vec_id").as("s_id"), col("embedding").as("s_emb")), Seq("query_id"))
        .select(col("query_id"), col("r.vec_id").as("vec_id"), col("r.rel").as("rel"),
          nativeCosine(spark)(col("r.embedding"), col("s_emb")).as("sim"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(first(col("rel")).as("rel"), max(col("sim")).as("max_sim"))
        .withColumn("score", lit(lam) * col("rel") - lit(oneMinusLam) * col("max_sim"))
        .withColumn("prk", row_number().over(wPick))
        .filter(col("prk") === 1)
      val next = scored
        .join(cands.select(col("query_id"), col("vec_id"), col("embedding")), Seq("query_id", "vec_id"))
        .select(col("query_id"), col("vec_id"), col("embedding"), lit(step.toLong).as("sel_rk"), col("score"))
      // each step references `all` twice (remaining-set anti-join + the
      // selected side of the similarity join), so an un-truncated plan
      // doubles per step — 2^k analysis/execution blowup. The selection
      // state is queries x step rows; materialize it and cut the lineage
      // (measured: 7.3 s -> 3.0 s at sf0.1; the remainder is the greedy
      // loop's per-round scheduling floor, same as connected components)
      all = all.unionByName(next).localCheckpoint(true)
    }
    val out = all.select(col("query_id"), col("sel_rk"), col("vec_id").as("neighbor_id"),
        round(col("score"), 4).as("mmr_score"))
      .orderBy(col("query_id"), col("sel_rk"))
    // The selection is |queries| x k rows BY CONSTRUCTION — independent of
    // corpus size — so it is safe to re-root the result as a local relation
    // and release every block this call persisted (the candidate cache and
    // each step's localCheckpoint; a checkpointed RDD cannot be unpersisted
    // while a returned frame still depends on it, hence the re-root). Net
    // persisted RDDs across a call: zero (asserted in OperatorsSpec).
    val rows = out.collect()
    cands.unpersist(blocking = true)
    val sc = spark.sparkContext
    (sc.getPersistentRDDs.keySet -- persistedBefore).foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = true))
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** The oracle restates the same unrolled greedy selection as chained
    * CTEs; the cosine is the q50-proven exact SQL restatement.
    */
  val q55Sql: String = {
    def cos(a: String, b: String): String =
      s"""(list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |  * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin
    def step(i: Int): String = {
      val prev = (1 until i).map(j => s"SELECT query_id, vec_id FROM sel$j").mkString(" UNION ALL ")
      s"""sel$i AS (
         |  SELECT query_id, vec_id, embedding, rel, 0.7 * rel - 0.3 * max_sim AS score FROM (
         |    SELECT r.query_id, r.vec_id, any_value(r.embedding) AS embedding,
         |      first(r.rel) AS rel, max(${cos("r.embedding", "s.embedding")}) AS max_sim
         |    FROM (SELECT c.* FROM cand c ANTI JOIN ($prev) p USING (query_id, vec_id)) r
         |    JOIN (SELECT query_id, embedding FROM ($prev) p JOIN cand USING (query_id, vec_id)) s
         |      USING (query_id)
         |    GROUP BY r.query_id, r.vec_id)
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) = 1)""".stripMargin
    }
    s"""WITH cand AS (
       |  SELECT query_id, vec_id, embedding, rel FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.embedding AS embedding,
       |      ${cos("q.embedding", "c.embedding")} AS rel
       |    FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
       |    JOIN embeddings c ON c.vec_id <> q.vec_id)
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, vec_id) <= 8),
       |sel1 AS (
       |  SELECT query_id, vec_id, embedding, rel, rel AS score FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, vec_id) = 1),
       |${step(2)},
       |${step(3)},
       |${step(4)}
       |SELECT query_id, sel_rk, vec_id AS neighbor_id, round(score, 4) AS mmr_score FROM (
       |  SELECT query_id, vec_id, CAST(1 AS BIGINT) AS sel_rk, score FROM sel1
       |  UNION ALL SELECT query_id, vec_id, 2, score FROM sel2
       |  UNION ALL SELECT query_id, vec_id, 3, score FROM sel3
       |  UNION ALL SELECT query_id, vec_id, 4, score FROM sel4)
       |ORDER BY query_id, sel_rk""".stripMargin
  }

  /** One k-means Lloyd refinement step over the embedding corpus — the
    * building block of semantic (cluster-then-dedup) curation: assign every
    * vector to its nearest current centroid (the q52 assignment), then emit
    * the per-cluster per-dimension QUANTIZED component sums + member counts
    * — i.e. the sufficient statistics of the updated centroids
    * (new centroid[d] = sum_q/2^20/n), kept as exact BIGINTs rather than
    * divided, so the result is bit-identical on any engine and any
    * partitioning.
    *
    * Exactness: each component is `round(CAST(float AS DOUBLE) · 2^20)` — a
    * float's mantissa shifted, so the product is exact and the rounded
    * value integral; integral doubles sum exactly (every partial sum
    * ≪ 2^53) in ANY order, making the aggregation deterministic despite
    * Spark's partial-agg ordering. This is the same fixed-point trick as
    * q53's int8 quantization, applied to the reduce side.
    *
    * Scale shape: centroids are a tiny broadcast — ONE row carrying the
    * full (label, centroid) array, so the per-vector argmax is a pure
    * scan-side array fold (array_max over per-centroid (cos, label)
    * structs): the corpus is NEVER shuffled or row-multiplied for
    * assignment (unlike the window-argmax idiom, which reshuffles k×corpus
    * rows on vec_id). The only wide exchange is the (cluster, dim)
    * partial-agg rollup, k × dim rows out of each partition. An actual
    * k-means LOOP at 100 TB iterates exactly this step with the sums
    * collected to the driver (k × dim doubles — trivially small) and
    * re-broadcast.
    */
  def q67KmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
    val cent = e.select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("cx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("label").as("c_label"), transform(col("pairs"), p => p.getField("cx")).as("centroid"))
    // one row, k (label, centroid, cnorm) structs — the whole "model"
    // broadcasts; centroid norms are precomputed HERE so the per-row fold
    // below never re-derives them (k × dim ops saved per corpus row)
    val centsRow = cent
      .select(col("c_label"), col("centroid"),
        norm(toDouble(col("centroid"))).as("cnorm"))
      .agg(collect_list(struct(col("c_label"), col("centroid"), col("cnorm"))).as("cents"))
    // per-row argmax: max (cos, -label) struct = highest cosine, smallest
    // label on ties — the same order the window/oracle restatement uses.
    // The embedding's double cast and norm are lambda-bound ONCE per row;
    // cos = dot/(ne * cnorm) composes the identical IEEE ops as cosine(),
    // so the oracle restatement is unchanged. (struct fields built inside a
    // HOF lambda lose their aliases and surface as col1/col2 — referenced
    // positionally below)
    val best = graft.functions.ColFns.bound(toDouble(col("embedding"))) { de =>
      graft.functions.ColFns.bound(norm(de)) { ne =>
        graft.functions.ColFns.bound(col("cents")) { cs =>
          array_max(transform(cs, c =>
            struct(dot(de, c.getField("centroid")) / (ne * c.getField("cnorm")),
              -c.getField("c_label"))))
        }
      }
    }
    // the argmax must be SELECTed below the posexplode: a generator select
    // puts its sibling expressions in the Project ABOVE the Generate, which
    // would re-evaluate the k-cosine fold once per exploded dimension
    // (measured 64x: 27 s -> 1.5 s at sf0.1 for this split)
    e.crossJoin(broadcast(centsRow))
      .select((-best.getField("col2")).as("cluster"), col("embedding"))
      .select(col("cluster"), posexplode(toDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("cluster"), (col("pos") + 1).cast("long").as("pos"))
      .agg(sum(round(col("x") * lit(1048576.0), 0)).cast("long").as("sum_q"),
        count(lit(1)).as("n_vecs"))
      .orderBy(col("cluster"), col("pos"))
  }

  val q67Sql: String = {
    val cos = cosineSql("e.embedding", "c.centroid")
    s"""WITH cent AS (
       |  SELECT label, list(cx ORDER BY pos) AS centroid FROM (
       |    SELECT label, t.pos, avg(CAST(embedding[t.pos] AS DOUBLE)) AS cx
       |    FROM embeddings, range(1, 65) t(pos)
       |    GROUP BY label, t.pos)
       |  GROUP BY label),
       |assigned AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT e.vec_id, c.label AS cluster,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c.label) AS rk
       |    FROM embeddings e CROSS JOIN cent c)
       |  WHERE rk = 1)
       |SELECT a.cluster, t.pos,
       |  CAST(sum(round(CAST(e.embedding[t.pos] AS DOUBLE) * 1048576)) AS BIGINT) AS sum_q,
       |  count(*) AS n_vecs
       |FROM assigned a JOIN embeddings e USING (vec_id), range(1, 65) t(pos)
       |GROUP BY a.cluster, t.pos ORDER BY cluster, pos""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_mmr_rerank" -> q55MmrRerank _,
    "q50_knn_brute" -> q50KnnBrute _,
    "q51_knn_lsh" -> q51KnnLsh _,
    "q52_ivf_assign" -> q52IvfAssign _,
    "q53_knn_quantized" -> q53KnnQuantized _,
    "q54_ivf_search" -> q54IvfSearch _,
    "q67_kmeans_step" -> q67KmeansStep _)

  val oracles: Map[String, String] = Map(
    "q55_mmr_rerank" -> q55Sql,
    "q50_knn_brute" -> q50Sql,
    "q51_knn_lsh" -> q51Sql,
    "q52_ivf_assign" -> q52Sql,
    "q53_knn_quantized" -> q53Sql,
    "q54_ivf_search" -> q54Sql,
    "q67_kmeans_step" -> q67Sql)
}
