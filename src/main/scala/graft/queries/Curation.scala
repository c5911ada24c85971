package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end training-data curation shapes: the composite pipelines a
  * 100 TB data-curation job actually runs — text quality gates joined with
  * embedding-space structure, per-source quotas, contamination-style
  * fingerprint checks.
  */
object Curation {

  import TextOps.{normText, wsTokens}

  /** Quality-gated multimodal join: documents that pass text-quality
    * filters, joined 1:1 to their embedding row, rolled up per (lang,
    * label). The doc side prunes columns + filters before the join; the
    * embedding side carries only (vec_id, label).
    */
  def q80CurationJoin(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("label"))
    val toks = wsTokens(normText(col("text")))
    val quality = d
      .select(col("doc_id"), col("lang"), size(toks).as("n_tokens"))
      .filter(col("n_tokens") >= 10)
    quality.join(e, quality("doc_id") === e("vec_id"))
      .groupBy(col("lang"), col("label"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("n_tokens")), 2).as("avg_tokens"))
      .orderBy(col("lang"), col("label"))
  }

  val q80Sql: String =
    """SELECT lang, label, count(*) AS n_docs, round(avg(n_tokens), 2) AS avg_tokens
      |FROM (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS n_tokens
      |  FROM documents) d
      |JOIN embeddings e ON d.doc_id = e.vec_id
      |WHERE n_tokens >= 10
      |GROUP BY lang, label ORDER BY lang, label""".stripMargin

  /** Per-source sampling quota: keep at most k docs per source, smallest
    * doc_id first — the dataset-mixing primitive (window top-k per group,
    * one shuffle on source).
    */
  def q81SourceQuota(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    d.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("source"), col("rk").cast("long").as("rk"), col("doc_id"))
      .orderBy(col("source"), col("rk"))
  }

  val q81Sql: String =
    """SELECT source, CAST(rk AS BIGINT) AS rk, doc_id FROM (
      |  SELECT source, doc_id, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 3 ORDER BY source, rk""".stripMargin

  /** Contamination check: which eval-set fingerprints appear in the corpus —
    * fingerprint both sides (md5 of the normalized leading-bigram prefix,
    * the n-gram-overlap style of decontamination), broadcast the small eval
    * set, semi-join. Here the "eval set" is every 50th doc.
    */
  private def prefixFp = md5(concat_ws(" ", slice(wsTokens(normText(col("text"))), 1, 2)))

  def q82Contamination(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val corpus = d.filter(col("doc_id") % 50 =!= 0).select(col("doc_id"), prefixFp.as("fp"))
    val eval = d.filter(col("doc_id") % 50 === 0).select(prefixFp.as("fp"))
    corpus.join(broadcast(eval), Seq("fp"), "left_semi")
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  val q82Sql: String =
    """WITH fps AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_slice(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'), t -> t <> ''), 1, 2), ' ')) AS fp
      |  FROM documents)
      |SELECT doc_id, fp FROM fps c
      |WHERE doc_id % 50 <> 0
      |  AND EXISTS (SELECT 1 FROM fps e WHERE e.doc_id % 50 = 0 AND e.fp = c.fp)
      |ORDER BY doc_id""".stripMargin

  /** Deterministic stratified train/val/test split: bucket = md5(doc_id)
    * mod 100, 80/10/10 — reproducible across runs/engines with no stored
    * assignment table (the property a 100 TB pipeline needs: any job can
    * recompute membership from the id alone). Emits per-(source, split)
    * counts as the stratification check.
    */
  def q84TrainSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = graft.functions.ColFns.h60(col("doc_id")) % 100
    Tables(spark, dir, "documents")
      .select(col("source"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("split"))
  }

  val q84Sql: String =
    """SELECT source, split, count(*) AS n_docs FROM (
      |  SELECT source,
      |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT source, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
      |        FROM documents))
      |GROUP BY source, split ORDER BY source, split""".stripMargin

  /** Exactly-n-per-stratum draw size for q105. */
  private[graft] val Q105SampleN = 20

  /** q105: deterministic fixed-size per-source sample — the eval-set /
    * human-review draw: exactly [[Q105SampleN]] docs per source, chosen as
    * the smallest md5-60 hashes of `doc_id`. Complements the other two
    * sampling shapes: q57 is RATE-based (a keep-probability filter, output
    * size binomial) and q84 is an ASSIGNMENT (every doc gets a split);
    * this one guarantees the exact count a labeling budget needs, still
    * stateless — membership is recomputable from `doc_id` alone, so the
    * same draw reproduces on any cluster with no stored sample table.
    *
    * Executed through the native [[graft.plans.TopK.perKey]] physical
    * operator: one hash exchange on `source`, map-side partial heaps prune
    * to ≤ n rows per stratum per task BEFORE the shuffle, no sort, no rank
    * column — at 100 TB the shuffle carries ~n·sources·tasks rows, not the
    * corpus, which is precisely the smallest-k-by-hash access pattern the
    * operator was built for.
    */
  def q105GroupSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.ColFns.h60(col("doc_id")).as("h"))
    graft.plans.TopK.perKey(d, Seq("source"),
        Seq("h" -> true, "doc_id" -> true), k = Q105SampleN)
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Oracle: the classic window idiom over the same shared hash family —
    * the native operator must be invisible in the result.
    */
  val q105Sql: String =
    s"""SELECT source, doc_id FROM (
       |  SELECT source, doc_id, row_number() OVER (
       |    PARTITION BY source
       |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $Q105SampleN ORDER BY source, doc_id""".stripMargin

  /** q122: source-mixture concentration (Gini index) per language — the
    * governance dial for "is this language's data all coming from one
    * crawl?": 0 = every source contributes equally, →1 = one source
    * dominates. Computed from the exact rank formula
    * `G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n` over per-source doc counts sorted
    * ascending — all sums BIGINT-exact, two correctly-rounded divisions
    * and one subtract at the end. The per-lang frame is sources-sized
    * (tiny), so the rank window costs nothing; the only corpus-scale work
    * is the (lang, source) count.
    */
  def q122SourceGini(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("lang")).orderBy(col("x"), col("source"))
    counts.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_sources"),
        sum(col("x")).as("n_docs"),
        sum(col("i") * col("x")).as("s1"))
      .withColumn("gini",
        (col("s1") * 2L).cast("double") / (col("n_sources") * col("n_docs"))
          - (col("n_sources") + 1L).cast("double") / col("n_sources"))
      .select(col("lang"), col("n_sources"), col("n_docs"), col("gini"))
      .orderBy(col("lang"))
  }

  val q122Sql: String =
    """SELECT lang, n_sources, n_docs,
      |  CAST(s1 * 2 AS DOUBLE) / (n_sources * n_docs)
      |    - CAST(n_sources + 1 AS DOUBLE) / n_sources AS gini
      |FROM (
      |  SELECT lang, count(*) AS n_sources,
      |    CAST(sum(x) AS BIGINT) AS n_docs,
      |    CAST(sum(i * x) AS BIGINT) AS s1
      |  FROM (
      |    SELECT lang, x,
      |      CAST(row_number() OVER (PARTITION BY lang ORDER BY x, source) AS BIGINT) AS i
      |    FROM (SELECT lang, source, count(*) AS x FROM documents GROUP BY lang, source))
      |  GROUP BY lang)
      |ORDER BY lang""".stripMargin

  /** q144 — weighted PRIORITY SAMPLING, Duffield–Lund–Thorup 2007 (JACM
    * 54(6)): the weighted-without-replacement sampler whose k-item sample
    * supports unbiased subset-sum estimates — the principled version of
    * "sample training docs proportional to length". Each doc gets priority
    * p = w / u with u = (h+1)/2^60 from the engine's deterministic md5_60
    * hash (no RNG — reruns and both engines agree bitwise); the k = 10
    * highest-priority docs are the sample, the (k+1)-th priority is the
    * threshold τ, and each sampled doc's Horvitz–Thompson weight estimate
    * is ŵ = max(w, τ) — summing ŵ over any subset of the sample unbiasedly
    * estimates that subset's true total weight. ŵ stays per-row (10 rows)
    * so the output has NO order-sensitive float aggregate; the only float
    * ops are per-row `*`/`/`/`max`, correctly rounded identically in both
    * engines.
    *
    * Scale: the top-(k+1) is a global TakeOrderedAndProject — per-partition
    * heaps of k+1 rows, one tiny reduce; no shuffle of the corpus, no RNG
    * state, and adding a shard re-ranks by the same deterministic hash
    * (the sample is a function OF THE DATA, so it is mergeable:
    * union-then-re-top-k, same as KMV).
    */
  def q144PrioritySample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val pr = d.select(
        col("doc_id"),
        greatest(length(col("text")), lit(1)).cast("long").as("w"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .select(col("doc_id"), col("w"),
        (col("w").cast("double") * lit(1152921504606846976L).cast("double") /
          (col("h") + lit(1L)).cast("double")).as("priority"))
    val top = pr.orderBy(col("priority").desc, col("doc_id")).limit(11)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("priority").desc, col("doc_id"))))
    // agg-to-one-row so a corpus smaller than k+1 yields tau = 0 (every
    // item sampled with probability 1, ŵ = w) instead of an empty join
    val tau = top.agg(coalesce(
      min(when(col("rn") === 11, col("priority"))), lit(0.0)).as("tau"))
    top.filter(col("rn") <= 10)
      .crossJoin(broadcast(tau))
      .select(col("doc_id"), col("w"), col("priority"), col("tau"),
        greatest(col("w").cast("double"), col("tau")).as("w_hat"))
      .orderBy(col("doc_id"))
  }

  val q144Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CAST(greatest(length(text), 1) AS BIGINT) AS w,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM documents),
      |pr AS (
      |  SELECT doc_id, w,
      |    CAST(w AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) /
      |      CAST(h + 1 AS DOUBLE) AS priority
      |  FROM p),
      |t AS (SELECT * FROM pr ORDER BY priority DESC, doc_id LIMIT 11),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
      |  FROM t),
      |tau AS (
      |  SELECT coalesce(min(CASE WHEN rn = 11 THEN priority END), 0.0) AS tau
      |  FROM r)
      |SELECT doc_id, w, priority, tau,
      |  greatest(CAST(w AS DOUBLE), tau) AS w_hat
      |FROM r, tau WHERE rn <= 10
      |ORDER BY doc_id""".stripMargin

  /** q163: TOKEN-BUDGET ALLOCATION across sources by exact integer
    * water-filling — the mixture-design step after quality gating: given
    * per-source token capacities and a total training budget B (here the
    * data-derived `total div 2`), saturate small sources (alloc = cap) and
    * level the rest at a common water line λ so Σ alloc = B EXACTLY.
    * Closed form over the sources-sized frame, no iteration: sort by cap
    * ascending, K = the largest prefix whose sources saturate at their own
    * exclusion level (cap_i · (m−i) ≤ B − prefix_i — monotone in i, so K
    * is well-defined), λ = (B − prefix_K) div (m−K), and the division
    * remainder goes one token each to the first (B − prefix_K) mod (m−K)
    * uncapped sources in the same order, making the budget exact in
    * integers. Every quantity is BIGINT arithmetic over a sources-sized
    * window — identical in both engines, and the whole allocator costs one
    * corpus scan (the capacity agg) plus a tiny single-partition window.
    */
  def q163TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val caps = Tables(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(size(wsTokens(normText(col("text")))).cast("long")).as("cap"))
    val b = caps.agg(expr("CAST(sum(cap) AS BIGINT) div 2").as("budget"))
    val ord = Window.orderBy(col("cap"), col("source"))
    val whole = Window.partitionBy()
    val idx = caps.crossJoin(broadcast(b))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("pref", sum(col("cap")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("m", count(lit(1)).over(whole).cast("long"))
      .withColumn("sat", col("cap") * (col("m") - col("i")) <= col("budget") - col("pref"))
      .withColumn("kk", coalesce(max(when(col("sat"), col("i"))).over(whole), lit(0L)))
      // pref is monotone in i, so max over satisfying rows IS pref at K
      .withColumn("pk", coalesce(max(when(col("sat"), col("pref"))).over(whole), lit(0L)))
    idx
      .withColumn("alloc",
        when(col("i") <= col("kk"), col("cap"))
          .otherwise(expr("(budget - pk) div (m - kk)") +
            when(col("i") - col("kk") <= expr("(budget - pk) % (m - kk)"), 1L).otherwise(0L)))
      .select(col("source"), col("cap").as("cap_tokens"), col("alloc").as("alloc_tokens"))
      .orderBy(col("source"))
  }

  val q163Sql: String =
    """WITH caps AS (
      |  SELECT source,
      |    CAST(sum(len(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'), t -> t <> ''))) AS BIGINT) AS cap
      |  FROM documents GROUP BY source),
      |b AS (SELECT CAST(sum(cap) AS BIGINT) // 2 AS budget FROM caps),
      |idx AS (
      |  SELECT source, cap, budget,
      |    row_number() OVER (ORDER BY cap, source) AS i,
      |    CAST(sum(cap) OVER (ORDER BY cap, source ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pref,
      |    count(*) OVER () AS m
      |  FROM caps, b),
      |k AS (
      |  SELECT
      |    coalesce(max(CASE WHEN cap * (m - i) <= budget - pref THEN i END), 0) AS kk,
      |    coalesce(max(CASE WHEN cap * (m - i) <= budget - pref THEN pref END), 0) AS pk
      |  FROM idx)
      |SELECT source, cap AS cap_tokens,
      |  CAST(CASE WHEN i <= kk THEN cap
      |       ELSE (budget - pk) // (m - kk)
      |            + (CASE WHEN i - kk <= (budget - pk) % (m - kk) THEN 1 ELSE 0 END)
      |  END AS BIGINT) AS alloc_tokens
      |FROM idx, k ORDER BY source""".stripMargin

  /** q197's dials — ONE definition interpolated into both engines. */
  private[graft] val Q197Buckets = 64
  private[graft] val Q197SampleK = 150

  /** q197 — DSIR-style IMPORTANCE RESAMPLING (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): reweight a
    * raw corpus toward a target domain using HASHED n-gram features, then
    * sample proportionally to the importance weights. Here the target is
    * the corpus's own `lang = 'en'` slice (any in-domain exemplar set
    * works the same way):
    *
    *   1. every whitespace token hashes into one of [[Q197Buckets]]
    *      buckets (md5-family — both engines agree bitwise);
    *   2. one scan counts each bucket's raw and target occurrences, and
    *      the per-bucket log-likelihood ratio ln(p_target/p_raw) (Laplace
    *      +1) is quantized to integer 1e-4 nats on the 64-row frame — all
    *      downstream arithmetic is exact BIGINT;
    *   3. a document's importance score is the sum of its tokens' bucket
    *      scores (the bag-of-hashed-ngrams log ratio);
    *   4. sampling-without-replacement ∝ exp(score) is the deterministic
    *      GUMBEL-TOP-K: key = score + quantized Gumbel noise from the
    *      md5_60 uniform of doc_id — no RNG state, reruns and engines
    *      agree, and the top-[[Q197SampleK]] keys ARE the resample.
    *
    * Scale: the bucket-stats frame is [[Q197Buckets]] rows broadcast back
    * to the token stream; the corpus side is one explode + one doc-keyed
    * partial-agg shuffle; selection is a global top-k (per-partition heaps,
    * one tiny reduce). Nothing is pairwise, nothing collects, and the
    * feature space stays constant-size no matter how large the corpus —
    * the published DSIR recipe's own scaling argument.
    */
  def q197ImportanceResample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val toks = d.select(col("doc_id"), col("lang"),
        explode(wsTokens(normText(col("text")))).as("tok"))
      .withColumn("b",
        pmod(conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"),
          lit(Q197Buckets.toLong)))
    // one pass: raw and target counts per bucket, then integer 1e-4-nat
    // log-likelihood ratios on the 64-row frame
    val stats = toks.groupBy(col("b")).agg(
      count(lit(1)).as("r_b"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_b"))
    val tot = stats.agg(sum(col("r_b")).as("r_tot"), sum(col("t_b")).as("t_tot"))
    val scores = stats.crossJoin(broadcast(tot))
      .select(col("b"),
        round(
          log(((col("t_b") + lit(1)).cast("double") / (col("t_tot") + lit(Q197Buckets)).cast("double")) /
            ((col("r_b") + lit(1)).cast("double") / (col("r_tot") + lit(Q197Buckets)).cast("double"))) * lit(1e4))
          .cast("long").as("s"))
    val docScore = toks.join(broadcast(scores), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("s")).as("score"), count(lit(1)).as("n_tokens"))
    // Gumbel-top-k: u ∈ (0,1) from md5_60(doc_id), g = -ln(-ln(u)),
    // quantized to the same 1e-4-nat grid so key addition stays BIGINT
    val keyed = docScore.withColumn("u",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("double") + lit(0.5)) / lit(1152921504606846976.0))
      .withColumn("gkey",
        col("score") + round(-log(-log(col("u"))) * lit(1e4)).cast("long"))
      .drop("u")
    keyed.orderBy(col("gkey").desc, col("doc_id")).limit(Q197SampleK)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("score"), col("gkey"))
      .orderBy(col("doc_id"))
  }

  val q197Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, tok,
       |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % $Q197Buckets AS b
       |  FROM (
       |    SELECT doc_id, lang,
       |      unnest(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'), t -> t <> '')) AS tok
       |    FROM documents)),
       |stats AS (
       |  SELECT b, count(*) AS r_b,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_b
       |  FROM toks GROUP BY b),
       |tot AS (SELECT sum(r_b) AS r_tot, sum(t_b) AS t_tot FROM stats),
       |scores AS (
       |  SELECT b, CAST(round(1e4 * ln(
       |    ((t_b + 1) / CAST(t_tot + $Q197Buckets AS DOUBLE)) /
       |    ((r_b + 1) / CAST(r_tot + $Q197Buckets AS DOUBLE)))) AS BIGINT) AS s
       |  FROM stats, tot),
       |ds AS (
       |  SELECT doc_id, lang,
       |    CAST(sum(s) AS BIGINT) AS score, CAST(count(*) AS BIGINT) AS n_tokens
       |  FROM toks JOIN scores USING (b)
       |  GROUP BY doc_id, lang),
       |keyed AS (
       |  SELECT doc_id, lang, n_tokens, score,
       |    score + CAST(round(1e4 * -ln(-ln(
       |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 0.5)
       |        / 1152921504606846976.0))) AS BIGINT) AS gkey
       |  FROM ds)
       |SELECT doc_id, lang, n_tokens, score, gkey
       |FROM (SELECT * FROM keyed ORDER BY gkey DESC, doc_id LIMIT $Q197SampleK)
       |ORDER BY doc_id""".stripMargin

  /** q198's per-stratum reservoir size. */
  private[graft] val Q198PerSource = 5

  /** q198 — STRATIFIED WEIGHTED RESERVOIR (Efraimidis–Spirakis 2006
    * exponential-clock sampling, A-ES): within every source, keep the
    * [[Q198PerSource]] docs with the smallest exponential keys
    * e = -ln(u)/w — a weighted-without-replacement sample ∝ w (here
    * w = n_chars) per stratum. Complements q144 (GLOBAL priority sample
    * with Horvitz–Thompson estimates) and q105 (per-group UNIFORM sample):
    * this is the "k docs per source, longer docs proportionally more
    * likely" mixture-building primitive. Uniforms come from the md5_60
    * hash of doc_id — deterministic, mergeable (union two shards and
    * re-take the k smallest keys: the A-ES distributed-merge property),
    * and bit-agreed across engines; keys are quantized to integer 1e-9
    * before ranking so the rank comparison is exact.
    *
    * Scale: one scan, one window partitioned BY SOURCE (Spark's
    * WindowGroupLimit keeps only k rows per partition pre-shuffle), no
    * global order. Adding a shard re-ranks by the same deterministic
    * keys — the reservoir is a function of the data, not of arrival order.
    */
  def q198WeightedReservoir(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val keyed = d.select(col("source"), col("doc_id"),
        greatest(col("n_chars"), lit(1L)).as("w"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("double") + lit(0.5)).as("hn"))
      .withColumn("ekey",
        round(-log(col("hn") / lit(1152921504606846976.0)) /
          col("w").cast("double") * lit(1e9)).cast("long"))
      .drop("hn")
    val w = Window.partitionBy(col("source")).orderBy(col("ekey"), col("doc_id"))
    keyed.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= Q198PerSource)
      .orderBy(col("source"), col("rk"))
  }

  val q198Sql: String =
    s"""SELECT source, doc_id, w, ekey, rk FROM (
       |  SELECT source, doc_id, w, ekey,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY ekey, doc_id) AS BIGINT) AS rk
       |  FROM (
       |    SELECT source, doc_id,
       |      CAST(greatest(n_chars, 1) AS BIGINT) AS w,
       |      CAST(round(1e9 * -ln(
       |        (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 0.5)
       |          / 1152921504606846976.0)
       |        / CAST(greatest(n_chars, 1) AS DOUBLE)) AS BIGINT) AS ekey
       |    FROM documents))
       |WHERE rk <= $Q198PerSource
       |ORDER BY source, rk""".stripMargin

  /** q204 — PER-SOURCE QUANTILE NORMALIZATION of a quality score: raw
    * scores from heterogeneous sources are not comparable (a crawl's
    * median length is not a curated corpus's), so every cross-source
    * quality gate first maps each doc to its source-conditional ECDF rank
    * — "better than X% of its own source" — and thresholds THAT. Exact
    * integers end to end: rank by (score, doc_id) within source,
    * pct_bp = 10000·(rank−1) div (n_source−1) (degenerate one-doc sources
    * pin to 0), so both engines agree bit-for-bit with no float ECDF.
    *
    * Scale: one source-partitioned rank window + one broadcastable
    * source-size frame — no global order, no corpus shuffle beyond the
    * source key. The output feeds q81-style quota gates with a
    * calibrated, source-fair score.
    */
  def q204QuantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val sizes = Window.partitionBy(col("source"))
    d.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_src", count(lit(1)).over(sizes).cast("long"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr("10000 * (rk - 1) div greatest(n_src - 1, 1)").as("pct_bp"))
      .orderBy(col("doc_id"))
  }

  val q204Sql: String =
    """SELECT doc_id, source, n_chars,
      |  CAST(10000 * (rk - 1) // greatest(n_src - 1, 1) AS BIGINT) AS pct_bp
      |FROM (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
      |    count(*) OVER (PARTITION BY source) AS n_src
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q213 — DIFFERENTIALLY-PRIVATE HISTOGRAM RELEASE via the geometric
    * mechanism (Ghosh, Roughgarden & Sundararajan 2009 — the discrete,
    * universally-optimal counterpart of Laplace noise): per (lang, source)
    * cell of the corpus mixture table, release n + Z where Z is two-sided
    * geometric with ratio α = 1/2, giving ε = ln 2 differential privacy
    * for the sensitivity-1 counting query. This is the publishable version
    * of the mixture report a data consortium shares without exposing any
    * single contributor's presence; the row carries the true count too
    * because the fixture run is a CALIBRATION AUDIT of the mechanism (the
    * q177 exact-alongside-estimate pattern) — a production release drops
    * that column.
    *
    * Exact seeded noise (no RNG, no transcendentals): α = 1/2 makes the
    * two-sided geometric CDF over magnitudes F(j) = 1 − (2/3)·2^−j, which
    * inverts in PURE INTEGER arithmetic against a 60-bit md5 uniform
    * u ∈ [0, 2^60): with T = 3·(2^60 − u), the sampled magnitude is the
    * smallest j with 2^(61−j) < T, i.e. j = max(0, 61 − ⌊log2 T⌋) —
    * bit-length arithmetic both engines compute identically, exact with no
    * boundary correction because T ≡ 0 (mod 3) is never a power of two
    * (T ≤ 3·2^60 fits Long; T ≥ 3 caps the magnitude at 60 — the
    * mechanism's 2^−60-mass tail, quoted with the release). The sign
    * bit is an independent md5 salt. Same-seed reruns release identical
    * tables — the reproducibility contract every published artifact in
    * this engine carries (q84 splits, q57 sampling).
    *
    * Scale: one fact-sized groupBy; noise is per-CELL scalar work on the
    * cells frame. Free at any table size.
    */
  /** The q213 magnitude inverse-CDF: smallest j ≥ 0 with u60/2^60 <
    * F(j) = 1 − (2/3)·2^−j, i.e. the smallest j with 2^(61−j) < T where
    * T = 3·(2^60 − u60) — closed-form j = max(0, 61 − ⌊log2 T⌋), exact
    * because T ≡ 0 (mod 3) can never be a power of two, so 2^⌊log2 T⌋ < T
    * strictly and the bit-length comparison needs no boundary correction.
    * Factored out so the spec can sweep it against an exact BigInt
    * rational reference.
    */
  private[graft] def geomMagCols(df: DataFrame): DataFrame = df
    .withColumn("t", lit(3L) * (lit(1152921504606846976L) - col("u60")))
    .withColumn("mag", greatest(lit(0), lit(61) - (length(bin(col("t"))) - 1)))

  def q213DpHistogram(spark: SparkSession, dir: String): DataFrame = {
    val h60 = graft.functions.ColFns.h60 _
    val cells = Tables(spark, dir, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
    geomMagCols(cells
      .withColumn("u60", h60(concat_ws(":", col("lang"), col("source"), lit("u")))))
      .withColumn("sign",
        when(h60(concat_ws(":", col("lang"), col("source"), lit("s"))) % 2 === 0, -1L)
          .otherwise(1L))
      .withColumn("noise", col("mag").cast("long") * col("sign"))
      .select(col("lang"), col("source"), col("n"), col("noise"),
        (col("n") + col("noise")).as("released"),
        greatest(lit(0L), col("n") + col("noise")).as("released_clamped"))
      .orderBy(col("lang"), col("source"))
  }

  val q213Sql: String =
    """WITH cells AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2),
      |seeded AS (
      |  SELECT lang, source, n,
      |    ('0x' || substr(md5(lang || ':' || source || ':u'), 1, 15))::BIGINT AS u60,
      |    ('0x' || substr(md5(lang || ':' || source || ':s'), 1, 15))::BIGINT AS s60
      |  FROM cells),
      |noise AS (
      |  SELECT lang, source, n,
      |    greatest(0, 61 - (length(bin(t)) - 1))
      |      * (CASE WHEN s60 % 2 = 0 THEN -1 ELSE 1 END) AS z
      |  FROM (SELECT lang, source, n, s60,
      |          3 * (1152921504606846976 - u60) AS t FROM seeded))
      |SELECT lang, source, n, CAST(z AS BIGINT) AS noise,
      |  CAST(n + z AS BIGINT) AS released,
      |  CAST(greatest(0, n + z) AS BIGINT) AS released_clamped
      |FROM noise
      |ORDER BY lang, source""".stripMargin

  /** q218 — DETERMINISTIC PSEUDONYMIZATION with REFERENTIAL INTEGRITY,
    * the GDPR art. 4(5) tokenization every data-sharing pipeline runs
    * before handing tables to a partner: replace the identifying key with
    * a keyed-hash token CONSISTENTLY ACROSS TABLES, so analytics (joins,
    * per-entity rollups) still work while the raw identifier never leaves
    * the boundary. Here c_custkey tokenizes to the md5-60 pseudonym in
    * BOTH customer and orders (salt 'pseud:v1' — in production a KMS
    * secret; fixed here so the oracle can restate it), the per-nation
    * revenue rollup is computed ENTIRELY in pseudonym space, and two
    * audits ride along per nation: `collisions` (distinct keys minus
    * distinct pseudonyms — token collisions would silently merge
    * customers) and the join-cardinality-preserving order count that only
    * matches the oracle's raw-key rollup if tokenization is consistent on
    * both sides.
    *
    * Scale: tokenization is per-row scalar hash work; the join and rollup
    * are the same shapes as the raw-key query — pseudonymization costs
    * one expression, not one shuffle. Completes the privacy family:
    * audit (q203) → release (q213) → share (q218) → erase (q214).
    */
  def q218Pseudonymize(spark: SparkSession, dir: String): DataFrame = {
    def pseud(c: org.apache.spark.sql.Column) =
      graft.functions.ColFns.h60(concat(lit("pseud:v1:"), c.cast("string")))
    val c = Tables(spark, dir, "customer")
      .select(pseud(col("c_custkey")).as("p_cust"), col("c_custkey"),
        col("c_nationkey"))
    val o = Tables(spark, dir, "orders")
      .select(pseud(col("o_custkey")).as("p_cust"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val rollup = c.join(o, Seq("p_cust"), "left")
      .groupBy(col("c_nationkey"))
      .agg(countDistinct(col("p_cust")).as("n_pseudonyms"),
        countDistinct(col("c_custkey")).as("n_keys"),
        count(col("cents")).as("n_orders"),
        coalesce(sum(col("cents")), lit(0L)).as("sum_cents"))
    rollup.select(col("c_nationkey"), col("n_pseudonyms"), col("n_orders"),
        col("sum_cents"),
        (col("n_keys") - col("n_pseudonyms")).as("collisions"))
      .orderBy(col("c_nationkey"))
  }

  val q218Sql: String =
    """WITH c AS (
      |  SELECT ('0x' || substr(md5('pseud:v1:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS p_cust,
      |    c_custkey, c_nationkey
      |  FROM customer),
      |o AS (
      |  SELECT ('0x' || substr(md5('pseud:v1:' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS p_cust,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT c_nationkey,
      |  CAST(count(DISTINCT p_cust) AS BIGINT) AS n_pseudonyms,
      |  CAST(count(cents) AS BIGINT) AS n_orders,
      |  CAST(coalesce(sum(cents), 0) AS BIGINT) AS sum_cents,
      |  CAST(count(DISTINCT c_custkey) - count(DISTINCT p_cust) AS BIGINT) AS collisions
      |FROM c LEFT JOIN o USING (p_cust)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** q224's replicate count and the Poisson(1) cumulative thresholds —
    * F(k) for k = 0..6, written ONCE as decimal literals and interpolated
    * into both engines (a literal parses to the same IEEE double
    * everywhere; the transcendental ban is on runtime libm calls, not on
    * constants). P(W > 7) ≈ 1e-5 is the documented truncation mass.
    */
  private[graft] val Q224Reps = 32
  private[graft] val Q224PoissonCdf: Seq[String] = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238462", "0.9963401531726563", "0.9994058151824183",
    "0.9999167588507119")

  /** q224 — POISSON BOOTSTRAP confidence intervals (Chamandy, Muralidharan,
    * Najmi & Naidu 2012 — the bootstrap that works at web scale): per
    * event_type, a ~90% percentile-bootstrap CI for the mean value-cents.
    * The classic index-resample needs a global row numbering and B
    * corpus-sized shuffled joins; the Poisson variant exploits
    * Binomial(n, 1/n) → Poisson(1): give every row an INDEPENDENT
    * deterministic Poisson(1) weight per replicate — ONE scan (exploded
    * ×[[Q224Reps]]), all aggregation keyed by (type, replicate), no index,
    * no extra shuffle shape beyond a groupBy.
    *
    * Determinism: the weight is the inverse-CDF of Poisson(1) over the
    * md5-60 uniform — the CDF values are fixed decimal LITERALS
    * ([[Q224PoissonCdf]]), so both engines do identical double compares;
    * weights and weighted sums are exact BIGINTs; each replicate's mean is
    * integral milli-units; the CI takes order statistics 2 and 31 of the
    * 32 replicate means (≈ the 5th/95th percentile — a ~90% central
    * interval) via a type-partitioned rank window. Same-seed reruns emit
    * identical intervals (the q213/q84 reproducibility contract).
    *
    * Scale: B× the scan plus a (types×B)-keyed aggregate; the rank window
    * runs over types×32 rows. Nothing is corpus-keyed beyond the one pass.
    */
  def q224PoissonBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val h60 = graft.functions.ColFns.h60 _
    val cdfCase = Q224PoissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 7L END")
    val e = Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    // the ×B draw explode + per-draw md5 is B× the scan's work INSIDE the
    // scan stage — rebalance the narrow input when its split count is
    // below the core count (a no-op on any many-row-group table at scale)
    val drawn = graft.operators.Fanout.rebalance(e)
      .withColumn("b", explode(array((0 until Q224Reps).map(lit(_)): _*)))
      .withColumn("u", (h60(concat_ws(":", lit("boot"), col("b"), col("event_id"))) /
        lit(1152921504606846976.0)))
      .withColumn("w", expr(cdfCase))
    // degenerate-replicate guard: a replicate whose Poisson weights are
    // all zero (probability e^-n per replicate — real for tiny groups)
    // resamples NOTHING and has no mean; both engine texts drop it
    // identically rather than divide by zero (Spark NULL vs DuckDB error
    // would otherwise diverge). The rank indices shift only when a
    // replicate actually vanishes, identically in both engines.
    val reps = drawn.groupBy(col("event_type"), col("b"))
      .agg(sum(col("w")).as("wn"), sum(col("w") * col("cents")).as("wsum"))
      .filter(col("wn") > 0)
      .withColumn("rep_mean_milli", expr("1000 * wsum div wn"))
    val wRk = Window.partitionBy(col("event_type"))
      .orderBy(col("rep_mean_milli"), col("b"))
    // the percentile RANKS derive from the SURVIVING replicate count, not
    // the constant B: with R replicates the ~5th/95th order statistics are
    // (R·5 div 100)+1 and R−(R·5 div 100) — equal to 2 and 31 at the full
    // R=32, and still the documented coverage when a replicate vanished
    // (constant indices would silently turn rk=31 into a 100th-percentile
    // bound on 31 survivors)
    val ci = reps.withColumn("rk", row_number().over(wRk))
      .withColumn("nreps",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(
        max(when(col("rk") === expr("(nreps * 5) div 100 + 1"),
          col("rep_mean_milli"))).as("boot_lo_milli"),
        max(when(col("rk") === expr("nreps - (nreps * 5) div 100"),
          col("rep_mean_milli"))).as("boot_hi_milli"))
    val full = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), expr("1000 * sum(cents) div count(*)").as("mean_milli"))
    full.join(ci, "event_type")
      .select(col("event_type"), col("n"), col("mean_milli"),
        col("boot_lo_milli"), col("boot_hi_milli"),
        (col("mean_milli") >= col("boot_lo_milli") &&
          col("mean_milli") <= col("boot_hi_milli")).as("covered"))
      .orderBy(col("event_type"))
  }

  val q224Sql: String = {
    val cdfCase = Q224PoissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }
      .mkString("CASE ", " ", " ELSE 7 END")
    s"""WITH e AS (
       |  SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |drawn AS (
       |  SELECT event_type, cents, r.b,
       |    ('0x' || substr(md5('boot:' || CAST(r.b AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
       |      / 1152921504606846976.0 AS u
       |  FROM e, range($Q224Reps) r(b)),
       |reps AS (
       |  SELECT event_type, b, CAST(sum(w) AS BIGINT) AS wn,
       |    CAST(sum(w * cents) AS BIGINT) AS wsum
       |  FROM (SELECT event_type, cents, b, $cdfCase AS w FROM drawn)
       |  GROUP BY 1, 2
       |  HAVING sum(w) > 0),
       |ranked AS (
       |  SELECT event_type, 1000 * wsum // wn AS rep_mean_milli,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY 1000 * wsum // wn, b) AS rk,
       |    count(*) OVER (PARTITION BY event_type) AS nreps
       |  FROM reps),
       |ci AS (
       |  SELECT event_type,
       |    max(CASE WHEN rk = (nreps * 5) // 100 + 1 THEN rep_mean_milli END) AS boot_lo_milli,
       |    max(CASE WHEN rk = nreps - (nreps * 5) // 100 THEN rep_mean_milli END) AS boot_hi_milli
       |  FROM ranked GROUP BY 1),
       |fullagg AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(1000 * sum(cents) // count(*) AS BIGINT) AS mean_milli
       |  FROM e GROUP BY 1)
       |SELECT f.event_type, f.n, f.mean_milli, c.boot_lo_milli, c.boot_hi_milli,
       |  f.mean_milli >= c.boot_lo_milli AND f.mean_milli <= c.boot_hi_milli AS covered
       |FROM fullagg f JOIN ci c USING (event_type)
       |ORDER BY f.event_type""".stripMargin
  }

  /** q225 — CORPUS DATASHEET ("Datasheets for Datasets", Gebru et al.
    * 2021; the data card every corpus release ships): per source, the
    * release-gate summary a consumer reads before training — volume
    * (docs, whitespace tokens), mean length, language mix, exact-duplicate
    * mass (docs sharing a normalized-text md5 fingerprint), and the
    * quality-gate pass rate. One row per source, every figure an exact
    * integer or integral basis points, so the datasheet is reproducible
    * and hash-comparable — a datasheet whose numbers drift between reruns
    * is worse than none.
    *
    * Scale: ONE corpus scan computes tokens/fingerprints; the per-source
    * aggregate fuses all measures (count-distinct included) into a single
    * pass — the q99 multi-aggregate shape applied to governance. Composes
    * the engine's deeper audits: this is the cover page; q122 (Gini),
    * q203/q213 (privacy), q41/q182 (near-dup mass), q33 (lang-ID) are the
    * chapters.
    */
  def q225Datasheet(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("source"), col("lang"),
        size(wsTokens(normText(col("text")))).cast("long").as("ntok"),
        md5(normText(col("text"))).as("fp"))
    d.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        expr("1000 * sum(ntok) div count(*)").as("mean_tokens_milli"),
        expr("10000 * count(CASE WHEN lang = 'en' THEN 1 END) div count(*)").as("pct_en_bp"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("fp"))).as("dup_docs"),
        expr("10000 * (count(*) - count(DISTINCT fp)) div count(*)").as("dup_bp"),
        expr("10000 * count(CASE WHEN ntok >= 5 THEN 1 END) div count(*)").as("quality_pass_bp"))
      .orderBy(col("source"))
  }

  val q225Sql: String =
    """WITH d AS (
      |  SELECT source, lang,
      |    CAST(len(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS BIGINT) AS ntok,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
      |  CAST(1000 * sum(ntok) // count(*) AS BIGINT) AS mean_tokens_milli,
      |  CAST(10000 * count(CASE WHEN lang = 'en' THEN 1 END) // count(*) AS BIGINT) AS pct_en_bp,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS dup_docs,
      |  CAST(10000 * (count(*) - count(DISTINCT fp)) // count(*) AS BIGINT) AS dup_bp,
      |  CAST(10000 * count(CASE WHEN ntok >= 5 THEN 1 END) // count(*) AS BIGINT) AS quality_pass_bp
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** q233 — the END-TO-END CURATION PIPELINE as one lineage: quality gate
    * → exact dedup → deterministic split → token budget, the minimal
    * "raw corpus in, training manifest out" path every release runs, here
    * as a single Catalyst plan so the optimizer sees the WHOLE pipeline
    * (filters push below the dedup window; the split assignment is a
    * projection; nothing materializes between stages). Stages are the
    * engine's own published semantics, composed: the q225 quality gate
    * (ntok ≥ 5), keep-min-doc_id exact dedup over the normalized-text
    * fingerprint (the q12/q32 contract), the q84 80/10/10 hash split, and
    * the perfectly-packed sequence LOWER BOUND ⌈Σ ntok / 256⌉ per cell
    * (the q49/q97 packers realize it; the bound is the budget figure).
    *
    * Per (split, lang): surviving docs, tokens, dropped-by-quality and
    * dropped-as-dup counts ride along so the manifest shows what the
    * pipeline did, not just what survived. Everything integral.
    *
    * Scale: one scan; the dedup window shuffles on the fingerprint (the
    * only corpus-keyed exchange); the rollup is cells-sized. This is the
    * row that proves the operators compose into the product the library
    * exists for.
    */
  def q233PipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(wsTokens(normText(col("text")))).cast("long").as("ntok"),
        md5(normText(col("text"))).as("fp"))
      .withColumn("q_pass", col("ntok") >= 5)
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val staged = d.filter(col("q_pass"))
      .withColumn("rn", row_number().over(wFp))
      .withColumn("keep", col("rn") === 1)
    val bucket = graft.functions.ColFns.h60(col("doc_id")) % 100
    val kept = staged.filter(col("keep"))
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
    val dropped = d.groupBy(col("lang"))
      .agg(count(when(!col("q_pass"), 1)).as("dropped_quality"))
    val dups = staged.groupBy(col("lang"))
      .agg(count(when(!col("keep"), 1)).as("dropped_dup"))
    kept.groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
        expr("(sum(ntok) + 255) div 256").as("n_seq_lb"))
      .join(broadcast(dropped), "lang")
      .join(broadcast(dups), "lang")
      .select(col("split"), col("lang"), col("n_docs"), col("n_tokens"),
        col("n_seq_lb"), col("dropped_quality"), col("dropped_dup"))
      .orderBy(col("split"), col("lang"))
  }

  val q233Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS BIGINT) AS ntok,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents),
      |q AS (SELECT *, ntok >= 5 AS q_pass FROM d),
      |staged AS (
      |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS keep
      |  FROM q WHERE q_pass),
      |kept AS (
      |  SELECT lang, ntok,
      |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
      |        FROM staged WHERE keep)),
      |dropped AS (
      |  SELECT lang, CAST(count(CASE WHEN NOT q_pass THEN 1 END) AS BIGINT) AS dropped_quality
      |  FROM q GROUP BY lang),
      |dups AS (
      |  SELECT lang, CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT) AS dropped_dup
      |  FROM staged GROUP BY lang)
      |SELECT k.split, k.lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(k.ntok) AS BIGINT) AS n_tokens,
      |  CAST((sum(k.ntok) + 255) // 256 AS BIGINT) AS n_seq_lb,
      |  max(dr.dropped_quality) AS dropped_quality,
      |  max(du.dropped_dup) AS dropped_dup
      |FROM kept k
      |JOIN dropped dr ON dr.lang = k.lang
      |JOIN dups du ON du.lang = k.lang
      |GROUP BY k.split, k.lang
      |ORDER BY k.split, k.lang""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q233_pipeline_e2e" -> q233PipelineE2e _,
    "q225_datasheet" -> q225Datasheet _,
    "q224_poisson_bootstrap" -> q224PoissonBootstrap _,
    "q218_pseudonymize" -> q218Pseudonymize _,
    "q213_dp_histogram" -> q213DpHistogram _,
    "q204_quantile_normalize" -> q204QuantileNormalize _,
    "q197_importance_resample" -> q197ImportanceResample _,
    "q198_weighted_reservoir" -> q198WeightedReservoir _,
    "q163_token_budget" -> q163TokenBudget _,
    "q144_priority_sample" -> q144PrioritySample _,
    "q80_curation_join" -> q80CurationJoin _,
    "q122_source_gini" -> q122SourceGini _,
    "q81_source_quota" -> q81SourceQuota _,
    "q82_contamination" -> q82Contamination _,
    "q84_train_split" -> q84TrainSplit _,
    "q105_group_sample" -> q105GroupSample _)

  val oracles: Map[String, String] = Map(
    "q233_pipeline_e2e" -> q233Sql,
    "q225_datasheet" -> q225Sql,
    "q224_poisson_bootstrap" -> q224Sql,
    "q218_pseudonymize" -> q218Sql,
    "q213_dp_histogram" -> q213Sql,
    "q204_quantile_normalize" -> q204Sql,
    "q197_importance_resample" -> q197Sql,
    "q198_weighted_reservoir" -> q198Sql,
    "q163_token_budget" -> q163Sql,
    "q144_priority_sample" -> q144Sql,
    "q80_curation_join" -> q80Sql,
    "q122_source_gini" -> q122Sql,
    "q81_source_quota" -> q81Sql,
    "q82_contamination" -> q82Sql,
    "q84_train_split" -> q84Sql,
    "q105_group_sample" -> q105Sql)
}
