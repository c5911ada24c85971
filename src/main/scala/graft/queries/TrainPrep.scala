package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ColFns

/** Training-data preparation operators: corpus-level boilerplate removal,
  * document chunking, and sequence packing — the steps between a deduped
  * corpus and a tokenizer-ready training shard.
  *
  * All three are pure declarative pipelines (explode + window + one keyed
  * shuffle each); at 100 TB each stage is scan-bound with a single
  * aggregation shuffle, and the chunk/pack geometry is deterministic from
  * (doc_id, token count) alone so shards are reproducible without any
  * driver-side state.
  */
object TrainPrep {

  /** Span width (tokens) for boilerplate detection and the cross-doc
    * frequency threshold above which a span counts as boilerplate.
    */
  val SpanW = 8
  val BoilerThreshold = 2

  /** Chunk window/stride (tokens) for q48. */
  val ChunkW = 32
  val ChunkStride = 24

  /** Token budget per packed sequence for q49. */
  val PackBudget = 512

  /** q47: C4-style boilerplate span removal, adapted to span granularity
    * (the synthetic docs are single-line, so the "line" unit is a fixed
    * 8-token span). A span is boilerplate when its exact text occurs in >=
    * [[BoilerThreshold]] DISTINCT documents corpus-wide. Per document:
    * total complete spans, boilerplate spans, and tokens kept after
    * dropping them.
    *
    * Scale shape: one explode (narrow), one count-distinct aggregation on
    * span text (the only shuffle that grows with corpus size), one
    * broadcast-able join back (the boilerplate span dictionary is tiny by
    * construction — it is the FREQUENT spans), one per-doc re-aggregation.
    */
  def q47BoilerplateSpans(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val toksD = d.select(col("doc_id"),
        ColFns.bound(TextOps.wsTokens(TextOps.normText(col("text")))) { toks =>
          struct(toks.as("toks"), size(toks).as("n_toks"))
        }.as("t"))
      .select(col("doc_id"), col("t.toks").as("toks"), col("t.n_toks").as("n_toks"))
    val spans = toksD
      .select(col("doc_id"), col("n_toks"),
        explode(when(col("n_toks") >= SpanW,
            expr(s"transform(sequence(0, n_toks div $SpanW - 1), i -> concat_ws(' ', slice(toks, i*$SpanW+1, $SpanW)))"))
          .otherwise(expr("array()"))).as("span"))
    // The dictionary joined back is ONLY the spans above the threshold —
    // boilerplate is frequent-by-definition, so this side stays orders of
    // magnitude smaller than the span stream and is usually broadcast-able
    // (AQE picks that up from its post-filter size).
    val boiler = spans.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= BoilerThreshold)
      .select(col("span"), lit(1L).as("is_boiler"))
    val perDoc = spans.join(boiler, Seq("span"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
    toksD.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        (col("n_toks").cast("long") - lit(SpanW.toLong) * coalesce(col("n_boiler"), lit(0L))).as("toks_kept"))
      .orderBy(col("doc_id"))
  }

  val q47Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |tt AS (SELECT doc_id, toks, len(toks) AS n_toks FROM t),
       |s AS (
       |  SELECT doc_id, unnest(CASE WHEN n_toks >= $SpanW
       |    THEN list_transform(range(0, n_toks // $SpanW),
       |           i -> array_to_string(toks[i*$SpanW+1 : i*$SpanW+$SpanW], ' '))
       |    ELSE [] END) AS span
       |  FROM tt),
       |c AS (SELECT span, count(DISTINCT doc_id) AS nd FROM s GROUP BY span),
       |p AS (
       |  SELECT s.doc_id, count(*) AS n_spans,
       |    sum(CASE WHEN c.nd >= $BoilerThreshold THEN 1 ELSE 0 END) AS n_boiler
       |  FROM s JOIN c USING (span) GROUP BY s.doc_id)
       |SELECT tt.doc_id,
       |  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(coalesce(p.n_boiler, 0) AS BIGINT) AS n_boiler,
       |  CAST(tt.n_toks - $SpanW * coalesce(p.n_boiler, 0) AS BIGINT) AS toks_kept
       |FROM tt LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q48: chunk every document into overlapping token windows
    * ([[ChunkW]]-token window, [[ChunkStride]]-token stride — the shape a
    * context-window tokenization pass emits). Each chunk row carries a
    * 16-hex md5 fingerprint of its text, so the oracle verifies the exact
    * chunk CONTENT, not just the geometry.
    *
    * Narrow explode per doc — no shuffle at all until a consumer
    * aggregates; chunk identity is (doc_id, chunk_idx), recomputable from
    * the source row alone.
    */
  def q48Chunking(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    d.select(col("doc_id"),
        ColFns.bound(TextOps.wsTokens(TextOps.normText(col("text")))) { toks =>
          struct(toks.as("toks"), size(toks).as("n_toks"))
        }.as("t"))
      .select(col("doc_id"), col("t.toks").as("toks"), col("t.n_toks").as("n_toks"))
      .filter(col("n_toks") > 0)
      .select(col("doc_id"), col("toks"), col("n_toks"),
        explode(expr(s"sequence(0, n_toks - 1, $ChunkStride)")).as("s"))
      .select(col("doc_id"),
        expr(s"s div $ChunkStride").cast("long").as("chunk_idx"),
        least(lit(ChunkW), col("n_toks") - col("s")).cast("long").as("chunk_len"),
        substring(md5(expr(s"concat_ws(' ', slice(toks, s + 1, $ChunkW))")), 1, 16).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val q48Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |tt AS (SELECT doc_id, toks, len(toks) AS n_toks FROM t WHERE len(toks) > 0),
       |c AS (SELECT doc_id, toks, n_toks, unnest(range(0, n_toks, $ChunkStride)) AS s FROM tt)
       |SELECT doc_id,
       |  CAST(s // $ChunkStride AS BIGINT) AS chunk_idx,
       |  CAST(least($ChunkW, n_toks - s) AS BIGINT) AS chunk_len,
       |  substr(md5(array_to_string(toks[s+1 : s+$ChunkW], ' ')), 1, 16) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** q49: sequence packing — assign documents to fixed-token-budget packs
    * ([[PackBudget]] tokens) by contiguous greedy fill per language, in
    * doc_id order. A document's pack is the budget bin its START offset
    * (running token count before it) lands in; documents straddling a
    * boundary belong to the pack they start in (the reader splits them).
    *
    * The assignment is a pure prefix-sum: recomputable from (lang, doc_id,
    * n_toks) with one window pass — no driver loop, no bin state. At 100 TB
    * the window partitions by lang (or by a (lang, shard) composite for
    * balance) and the per-pack aggregation reuses the same partitioning, so
    * the whole operator is one shuffle.
    */
  def q49SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    d.select(col("doc_id"), col("lang"),
        TextOps.regexTokenCount(col("text")).cast("long").as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      // integer div, not `/` — double division would lose exactness past
      // 2^53 cumulative tokens (reachable at 100 TB)
      .withColumn("pack_id", expr(s"(cum - n_toks) div $PackBudget"))
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("pack_toks"),
        min(col("doc_id")).as("doc_lo"),
        max(col("doc_id")).as("doc_hi"))
      .orderBy(col("lang"), col("pack_id"))
  }

  val q49Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, n_toks,
       |    CAST(sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t)
       |SELECT lang,
       |  CAST((cum - n_toks) // $PackBudget AS BIGINT) AS pack_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS pack_toks,
       |  min(doc_id) AS doc_lo, max(doc_id) AS doc_hi
       |FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin

  /** Shard fan-out inside each language for q97. */
  val NShards = 8

  /** q97: SHARDED sequence packing — the skew-proof variant of [[q49SequencePacking]]
    * for corpora where one language dominates (a 90%-English 100 TB corpus
    * would serialize q49's per-lang prefix sum through ONE task). Documents
    * shard by a hash of doc_id WITHIN each language, the prefix sum runs per
    * (lang, shard), and a pack's identity is (lang, shard, pack_id) — every
    * shard fills its own budget bins independently, so the window
    * parallelism is langs x [[NShards]] regardless of language skew, and the
    * assignment stays recomputable from (doc_id, token count) alone (no
    * driver state, reproducible shards).
    *
    * The shard hash is the md5-60bit family shared with the oracle (the
    * dedup/banding trick): both engines compute
    * `int(md5(doc_id)[0:15 hex]) % NShards`, so DuckDB restates the exact
    * shard arithmetic. At a real deployment NShards scales with
    * dominant-language volume / target-task size (SURVEY §9).
    */
  def q97ShardedPacking(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    d.select(col("doc_id"), col("lang"),
        TextOps.regexTokenCount(col("text")).cast("long").as("n_toks"))
      .withColumn("shard", graft.functions.ColFns.h60(col("doc_id")) % NShards)
      .withColumn("cum", sum(col("n_toks")).over(w))
      // integer div for the same 2^53 reason as q49
      .withColumn("pack_id", expr(s"(cum - n_toks) div $PackBudget"))
      .groupBy(col("lang"), col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("pack_toks"),
        min(col("doc_id")).as("doc_lo"),
        max(col("doc_id")).as("doc_hi"))
      .orderBy(col("lang"), col("shard"), col("pack_id"))
  }

  val q97Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_toks,
       |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % $NShards AS shard
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, shard, n_toks,
       |    CAST(sum(n_toks) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t)
       |SELECT lang, shard,
       |  CAST((cum - n_toks) // $PackBudget AS BIGINT) AS pack_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS pack_toks,
       |  min(doc_id) AS doc_lo, max(doc_id) AS doc_hi
       |FROM c GROUP BY lang, shard, pack_id ORDER BY lang, shard, pack_id""".stripMargin

  /** Content-defined chunking divisor: a boundary opens where the token
    * bigram's md5-60 hash ≡ 0 mod 8 — expected chunk length 8 tokens.
    */
  private val CdcD = 8

  /** Content-defined chunking — the shift-invariant alternative to q48's
    * fixed stride: a token STARTS a new chunk iff the (previous, current)
    * token bigram's hash hits the divisor (md5-60 % 8 == 0), so boundaries
    * depend only on local CONTENT, not on position. Insert or delete a
    * token and chunk fingerprints re-align from the next boundary onward —
    * the property that makes chunk-level dedup robust to edits, which a
    * fixed stride structurally cannot provide (every downstream chunk
    * shifts). Same family as Rabin/gear CDC, with the engine-portable
    * md5-60 hash so the oracle restates boundaries verbatim.
    *
    * Scale shape: one narrow explode, ONE hash exchange on doc_id shared by
    * both window passes (lag for the bigram flag, running sum for the chunk
    * id), one per-chunk aggregation reusing the same clustering — the q49
    * prefix-sum pattern applied at token granularity.
    */
  def q100CdcChunking(spark: SparkSession, dir: String): DataFrame =
    cdcChunks(Tables(spark, dir, "documents"))

  /** CDC over any (doc_id, text) frame — extracted so the shift-invariance
    * property (edits re-align at the next boundary) is testable on
    * synthesized documents.
    */
  def cdcChunks(d: DataFrame): DataFrame = {
    val toks = d
      .select(col("doc_id"), posexplode(TextOps.wsTokens(TextOps.normText(col("text"))))
        .as(Seq("pos", "t")))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigram = concat(lag(col("t"), 1).over(wOrd), lit(" "), col("t"))
    val flag = when(lag(col("t"), 1).over(wOrd).isNull, lit(0))
      .otherwise((graft.functions.ColFns.h60(bigram) % CdcD === 0).cast("int"))
    toks.withColumn("flag", flag)
      .withColumn("chunk_id",
        sum(col("flag")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(
        min(col("pos")).cast("long").as("start_pos"),
        count(lit(1)).as("n_tokens"),
        substring(md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("t")))),
            p => p.getField("t")))), 1, 16).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val q100Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS t FROM (
       |    SELECT doc_id,
       |      list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '') AS toks
       |    FROM documents)),
       |flagged AS (
       |  SELECT doc_id, pos, t,
       |    CASE WHEN lag(t) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL THEN 0
       |         WHEN ('0x' || substr(md5(lag(t) OVER (PARTITION BY doc_id ORDER BY pos) || ' ' || t), 1, 15))::BIGINT % $CdcD = 0 THEN 1
       |         ELSE 0 END AS flag
       |  FROM tok),
       |chunked AS (
       |  SELECT doc_id, pos, t,
       |    sum(flag) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
       |  FROM flagged)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, CAST(min(pos) AS BIGINT) AS start_pos,
       |  count(*) AS n_tokens,
       |  substr(md5(array_to_string(list(t ORDER BY pos), ' ')), 1, 16) AS chunk_md5
       |FROM chunked GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id""".stripMargin

  /** Synthetic arrival batches for q119 (doc_id mod — recomputable). */
  private[graft] val NoveltyBatches = 5

  /** q119: crawl novelty rate — per ingest batch, what fraction of its
    * distinct [[SpanW]]-token spans was NEVER seen in any earlier batch.
    * The metric an ingestion pipeline watches daily: novelty collapsing
    * toward zero means the crawler is re-fetching the same content and
    * the marginal data is duplicate mass, not new training signal.
    * Batches are carved from doc_id (recomputable); presence reduces to
    * DISTINCT (batch, span) before anything joins, and the first-seen
    * batch is one min-agg on span keys — the same span-keyed shuffle q47
    * already pays, reused as a time axis. At scale the span→first_batch
    * table is the persisted artifact (same move as the MinHash signature
    * store) and each day's batch joins against it incrementally.
    */
  def q119NoveltyRate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val toksD = d.select(col("doc_id"),
        ColFns.bound(TextOps.wsTokens(TextOps.normText(col("text")))) { toks =>
          struct(toks.as("toks"), size(toks).as("n_toks"))
        }.as("t"))
      .select(col("doc_id"), col("t.toks").as("toks"), col("t.n_toks").as("n_toks"))
    val presence = toksD
      .select((col("doc_id") % NoveltyBatches).as("batch"),
        explode(when(col("n_toks") >= SpanW,
            expr(s"transform(sequence(0, n_toks div $SpanW - 1), i -> concat_ws(' ', slice(toks, i*$SpanW+1, $SpanW)))"))
          .otherwise(expr("array()"))).as("span"))
      .distinct()
    val first = presence.groupBy(col("span")).agg(min(col("batch")).as("first_batch"))
    presence.join(first, Seq("span"))
      .groupBy(col("batch"))
      .agg(
        count(lit(1)).as("n_spans"),
        count(when(col("batch") === col("first_batch"), lit(1))).as("n_new"))
      .withColumn("novelty", col("n_new").cast("double") / col("n_spans"))
      .orderBy(col("batch"))
  }

  val q119Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |tt AS (SELECT doc_id, toks, len(toks) AS n_toks FROM t),
       |s AS (
       |  SELECT DISTINCT doc_id % $NoveltyBatches AS batch,
       |    unnest(CASE WHEN n_toks >= $SpanW
       |      THEN list_transform(range(0, n_toks // $SpanW),
       |             i -> array_to_string(toks[i*$SpanW+1 : i*$SpanW+$SpanW], ' '))
       |      ELSE [] END) AS span
       |  FROM tt),
       |f AS (SELECT span, min(batch) AS first_batch FROM s GROUP BY span)
       |SELECT batch, count(*) AS n_spans,
       |  count(CASE WHEN batch = first_batch THEN 1 END) AS n_new,
       |  CAST(count(CASE WHEN batch = first_batch THEN 1 END) AS DOUBLE) / count(*) AS novelty
       |FROM s JOIN f USING (span)
       |GROUP BY batch ORDER BY batch""".stripMargin


  /** q234's negatives per anchor and the dense-index bucket count. */
  private[graft] val Q234K = 4
  private[graft] val Q234Buckets = 32

  /** q234 — DETERMINISTIC NEGATIVE SAMPLING for contrastive training:
    * per anchor document, [[Q234K]] uniform negatives drawn from the
    * whole corpus, EXCLUDING content-identical docs (fingerprint match —
    * a "negative" that is the anchor's duplicate poisons the loss), every
    * draw recomputable from ids alone (the q84/q57 statelessness
    * contract). Complements q113: hard-negative mining picks the CLOSEST
    * non-matches via ANN; this picks the unbiased background sample the
    * same training batch also needs.
    *
    * The interesting scale problem is "index the corpus densely 0..n−1 so
    * a hash can address a uniform row" WITHOUT a global window (a
    * single-partition row_number is the engine's canonical scale-killer):
    * bucket every doc by hash, row_number WITHIN each bucket (group-
    * partitioned window), prefix-sum the 32 bucket counts (a 32-row
    * frame), and idx = bucket_offset + local_rn − 1 — a dense permutation
    * built from one keyed window plus broadcast-sized offset arithmetic.
    * Draw j for anchor a targets idx = h60(a:j) mod n; a draw whose
    * target shares the anchor's fingerprint is REJECTED (deterministically
    * — the row just doesn't emit; the collision rate is the dup rate, and
    * a consumer needing exactly k redraws with j' = k + j the same way).
    *
    * Scale: one fingerprint scan, one bucket-keyed window, one
    * (idx)-keyed equi-join of anchors×k against the indexed corpus — no
    * global sort anywhere.
    */
  def q234NegativeSampling(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.TextOps.{normText}
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(normText(col("text"))).as("fp"))
    val bucketed = d.withColumn("b",
      pmod(ColFns.h60(concat(lit("nsix:"), col("doc_id").cast("string"))), lit(Q234Buckets.toLong)))
    val wB = Window.partitionBy(col("b")).orderBy(col("doc_id"))
    val local = bucketed.withColumn("rn", row_number().over(wB))
    val counts = local.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    val wOff = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the offsets window is over the 32-row bucket-count frame — a
    // documented tiny global window (the q185/q178 class), never the corpus
    val offsets = counts
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
    val indexed = local.join(broadcast(offsets), "b")
      .select(col("doc_id").as("neg_id"), col("fp").as("neg_fp"),
        (col("off") + col("rn") - 1).as("idx"))
    val n = d.agg(count(lit(1)).as("n"))
    val draws = d.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("anchor_id"), col("fp").as("anchor_fp"))
      .withColumn("j", explode(array((0 until Q234K).map(lit(_)): _*)))
      .crossJoin(broadcast(n))
      .withColumn("idx", ColFns.h60(
        concat(col("anchor_id").cast("string"), lit(":"), col("j").cast("string"))) % col("n"))
    draws.join(indexed, "idx")
      .filter(col("neg_fp") =!= col("anchor_fp"))
      .select(col("anchor_id"), col("j").cast("long").as("j"), col("neg_id"))
      .orderBy(col("anchor_id"), col("j"))
  }

  val q234Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM documents),
       |bucketed AS (
       |  SELECT doc_id, fp,
       |    ('0x' || substr(md5('nsix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $Q234Buckets AS b
       |  FROM d),
       |local_rn AS (
       |  SELECT doc_id, fp, b,
       |    row_number() OVER (PARTITION BY b ORDER BY doc_id) AS rn
       |  FROM bucketed),
       |offsets AS (
       |  SELECT b, coalesce(sum(cnt) OVER (ORDER BY b
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM (SELECT b, count(*) AS cnt FROM bucketed GROUP BY b)),
       |indexed AS (
       |  SELECT l.doc_id AS neg_id, l.fp AS neg_fp, o.off + l.rn - 1 AS idx
       |  FROM local_rn l JOIN offsets o ON o.b = l.b),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
       |draws AS (
       |  SELECT a.doc_id AS anchor_id, a.fp AS anchor_fp, j.j,
       |    ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)), 1, 15))::BIGINT % n.n AS idx
       |  FROM d a, (SELECT unnest(range($Q234K)) AS j) j, n
       |  WHERE a.doc_id % 5 = 0)
       |SELECT dr.anchor_id, CAST(dr.j AS BIGINT) AS j, i.neg_id
       |FROM draws dr JOIN indexed i ON i.idx = dr.idx
       |WHERE i.neg_fp <> dr.anchor_fp
       |ORDER BY dr.anchor_id, dr.j""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q234_negative_sampling" -> q234NegativeSampling _,
    "q119_novelty_rate" -> q119NoveltyRate _,
    "q47_boilerplate_spans" -> q47BoilerplateSpans _,
    "q48_chunking" -> q48Chunking _,
    "q49_sequence_packing" -> q49SequencePacking _,
    "q97_sharded_packing" -> q97ShardedPacking _,
    "q100_cdc_chunking" -> q100CdcChunking _)

  val oracles: Map[String, String] = Map(
    "q234_negative_sampling" -> q234Sql,
    "q119_novelty_rate" -> q119Sql,
    "q47_boilerplate_spans" -> q47Sql,
    "q48_chunking" -> q48Sql,
    "q49_sequence_packing" -> q49Sql,
    "q97_sharded_packing" -> q97Sql,
    "q100_cdc_chunking" -> q100Sql)
}
