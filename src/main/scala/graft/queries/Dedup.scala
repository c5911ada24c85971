package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection for training-data curation, built to the scale
  * contract: NEVER an all-pairs cross join. Every fuzzy method reduces to
  * "compute a per-document signature (narrow, codegen'd), shuffle once on a
  * bucket key, compare only within buckets" — the LSH pattern that holds at
  * 100 TB because candidate generation is O(n · bands), not O(n²).
  *
  * Signatures use xxhash64 (codegen'd Catalyst expression) — deterministic
  * across runs/executors, no fitted model state.
  */
object Dedup {

  import TextOps.{normText, wsTokens}

  /** Distinct word-token set per doc — the shingle universe for MinHash /
    * Jaccard. (Unigram shingles; word n-grams are `shingles(c, n)`.)
    */
  def tokenSet(c: Column): Column = array_distinct(wsTokens(normText(c)))

  /** Word n-gram shingles. The token array is lambda-bound: the slice
    * lambda references it once per shingle, which without binding re-ran
    * the regex tokenization per element (measured 8.7 s -> sub-second for
    * 5k docs at sf0.1).
    */
  def shingles(c: Column, n: Int): Column =
    graft.functions.ColFns.bound(wsTokens(normText(c))) { toks =>
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
    }

  import graft.functions.ColFns.bound

  /** MinHash signature of an array of shingles: sig(j) = min over shingles
    * of xxhash64(j, shingle). One narrow projection, no shuffle, no fitted
    * model. The shingle array is lambda-bound so it is built once per row,
    * not once per hash function (see ColFns.bound).
    */
  def minhashSig(shingleCol: Column, k: Int): Column =
    bound(shingleCol) { sh =>
      transform(sequence(lit(0), lit(k - 1)),
        j => array_min(transform(sh, s => xxhash64(j, s))))
    }

  /** LSH band keys: hash of each r-slice of the signature, signature bound
    * once per row.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    bound(sig) { s =>
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(s, b * rows + 1, lit(rows))))
    }

  private val K = 32; private val BANDS = 8; private val ROWS = 4

  /** Scala-side shingling + MinHash for the hot path: Catalyst higher-order
    * functions are interpreted per element, so a scalar-heavy loop like
    * "hash every shingle k times" is strictly faster as a typed map
    * (measured 3.4 s -> sub-second for the sf0.1 signature pass). Tokens
    * match `shingles()` exactly: lowercase, split on whitespace, distinct
    * word n-grams.
    */
  def minhashSigRows(spark: SparkSession, docs: DataFrame, n: Int, k: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val sh: Iterator[String] =
        if (toks.length < n) Iterator(toks.mkString(" "))
        else (0 to toks.length - n).iterator.map(i => toks.slice(i, i + n).mkString(" ")).distinct
      val sig = Array.fill(k)(Long.MaxValue)
      sh.foreach { s =>
        // FNV-1a base hash, then k splitmix64-style derived hash functions
        var base = 0xcbf29ce484222325L
        var ci = 0
        while (ci < s.length) { base ^= s.charAt(ci); base *= 0x100000001b3L; ci += 1 }
        var j = 0
        while (j < k) {
          var h = base ^ (j * 0x9e3779b97f4a7c15L)
          h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
          h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
          h ^= h >>> 31
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      (id, sig)
    }.toDF("doc_id", "sig")
  }

  /** MinHash + LSH candidate pairs with signature-estimated Jaccard —
    * un-limited. Pipeline: per-doc signature over word 3-gram shingles
    * (narrow) -> explode 8 band keys -> shuffle on (band, key) ->
    * within-bucket pairing on IDS ONLY -> distinct pairs -> join signatures
    * back for the estimate.
    *
    * Scale guards (the difference between O(n·bands) and accidental O(n²)):
    *   - 3-gram shingles, not unigram token sets: discriminative enough
    *     that unrelated docs don't share band keys (a small-vocabulary
    *     corpus makes unigram sets nearly identical across documents);
    *   - oversized buckets (> maxBucket docs) are dropped — a bucket that
    *     big is non-discriminative by definition and would contribute
    *     O(bucket²) candidate pairs; real near-dup clusters stay far below
    *     the cap once shingles are discriminative;
    *   - the bucket self-join carries only (band, key, doc_id); the
    *     32-element signatures join back AFTER pair dedup.
    */
  def minhashCandidates(spark: SparkSession, dir: String, maxBucket: Int = 256): DataFrame = {
    val d = Tables(spark, dir, "documents")
    // the signature frame feeds three plan branches (banding + both sides of
    // the pair-signature join); persist so it computes once (~32 longs/doc)
    val sigs = minhashSigRows(spark, d, n = 3, k = K)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = sigs
      .select(col("doc_id"), posexplode(bandKeys(col("sig"), BANDS, ROWS)).as(Seq("band", "key")))
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("key"))))
      .filter(col("bsz") <= maxBucket)
      .select(col("band"), col("key"), col("doc_id"))
    val pairs = buckets.as("a")
      .join(buckets.as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / K, 4).as("est_jaccard"))
  }

  /** Query surface for the candidates: top pairs, deterministic order. */
  def q40MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashCandidates(spark, dir)
      .orderBy(col("est_jaccard").desc, col("id_a"), col("id_b"))
      .limit(100)

  /** The user-facing dedup operator: remove near-duplicates above a
    * similarity threshold, keeping the smallest doc_id of each duplicate
    * group (greedy by id: a doc is dropped iff it is near-dup of ANY
    * smaller-id doc — deterministic, one anti-join, no iterative
    * connected-components pass; at 100 TB this is the standard
    * single-sweep policy).
    */
  def dedupDocuments(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val losers = minhashCandidates(spark, dir)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_b").as("doc_id")) // id_a < id_b: the larger id loses
      .distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Surviving-corpus summary after near-dup removal (rows-only check —
    * candidates are hash-based; invariants tested in QueriesSpec).
    */
  def q45DedupApply(spark: SparkSession, dir: String): DataFrame =
    dedupDocuments(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))

  /** Exact n-gram (token-set) Jaccard within blocks. Blocking key =
    * (lang, source) — the standard "never cross the full corpus" guard;
    * block sizes stay O(corpus / #blocks) so the within-block pairing
    * (a shuffled equi-join on the block key) is linear-ish in the corpus.
    * Lang-only blocking measured 36 s at sf0.1 (5k-doc blocks -> 125M
    * pairs); (lang, source) keeps blocks ~50 docs.
    */
  def q41NgramJaccard(spark: SparkSession, dir: String, maxBlock: Int = 1024): DataFrame = {
    // Block-size cap: within-block pairing is O(block²), so an uncapped hot
    // block (a skewed ("en","web") at 100 TB is the whole corpus) is a
    // quadratic scale-killer. Oversized blocks are dropped, same policy as
    // the LSH maxBucket guard above; q41DroppedBlocks reports what was cut.
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), tokenSet(col("text")).as("toks"))
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"), col("source"))))
      .filter(col("bsz") <= maxBlock)
    val a = d.select(col("lang"), col("source"), col("doc_id").as("id_a"), col("toks").as("toks_a"))
    val b = d.select(col("lang"), col("source"), col("doc_id").as("id_b"), col("toks").as("toks_b"))
    a.join(b, Seq("lang", "source"))
      .filter(col("id_a") < col("id_b"))
      .select(col("lang"), col("id_a"), col("id_b"),
        round(
          size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  /** Blocks q41 dropped under its cap — surface them so truncation is never
    * silent (a dropped block means "this slice needs LSH, not exact pairing").
    */
  def q41DroppedBlocks(spark: SparkSession, dir: String, maxBlock: Int = 1024): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") > maxBlock)
      .orderBy(col("block_size").desc, col("lang"), col("source"))

  /** SimHash: 64-bit signature where bit i is the sign of the weighted sum
    * of token-hash bits. Computed per-row with typed Scala (narrow map — the
    * per-record imperative case); bucketed by the top 16 bits for banding.
    */
  def simhash64(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      // FNV-1a 64-bit — stable scalar hash, no Spark dependency
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
      var bit = 0
      while (bit < 64) { if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1; bit += 1 }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) >= 0) out |= (1L << bit); bit += 1 }
    out
  }

  def q42Simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), wsTokens(normText(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
    d.map { case (id, toks) => (id, simhash64(toks)) }
      .toDF("doc_id", "simhash")
      .withColumn("bucket", shiftrightunsigned(col("simhash"), 48))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs: bucket by top-16 bits, compare hamming distance
    * within buckets only (bit_count of xor — codegen'd).
    */
  def q43SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = q42Simhash(spark, dir)
    val a = sigs.select(col("bucket"), col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = sigs.select(col("bucket"), col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .orderBy(col("hamming"), col("id_a"), col("id_b"))
      .limit(100)
  }

  /** Embedding near-dup: random-hyperplane LSH buckets (deterministic seeded
    * planes), cosine computed only within buckets. The 100 TB path: one
    * narrow signature pass + one shuffle on the 6-bit bucket key.
    */
  def q44EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
    val withB = Similarity.withBucket(e, nBits = 6)
      .select(col("bucket"), col("vec_id"), Similarity.unitVec(col("embedding")).as("unit"))
    val a = withB.select(col("bucket"), col("vec_id").as("id_a"), col("unit").as("u_a"))
    val b = withB.select(col("bucket"), col("vec_id").as("id_b"), col("unit").as("u_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(Similarity.dot(col("u_a"), col("u_b")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_dedup_minhash_lsh" -> q40MinhashLsh _,
    "q41_dedup_ngram_jaccard" -> ((s: SparkSession, dir: String) => q41NgramJaccard(s, dir)),
    "q45_dedup_apply" -> q45DedupApply _,
    "q42_dedup_simhash" -> q42Simhash _,
    "q43_dedup_simhash_pairs" -> q43SimhashPairs _,
    "q44_dedup_embedding" -> q44EmbeddingNearDup _)

  /** Jaccard is SQL-expressible — oracle it; the hash-based signatures are
    * engine-specific (xxhash64/FNV) so those get rows-only checks.
    */
  val oracles: Map[String, String] = Map(
    "q41_dedup_ngram_jaccard" ->
      """SELECT lang, id_a, id_b, jaccard FROM (
        |  SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
        |  FROM (SELECT doc_id, lang, source, list_distinct(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS toks FROM documents) a
        |  JOIN (SELECT doc_id, lang, source, list_distinct(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS toks FROM documents) b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        |ORDER BY jaccard DESC, id_a, id_b LIMIT 50""".stripMargin)
}
