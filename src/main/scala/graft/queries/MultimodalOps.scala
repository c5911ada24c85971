package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Driver-checked multimodal queries: binary payloads synthesized
  * deterministically from the documents table (text bytes as the opaque
  * media column), pushed through the REAL chunk-sampling plumbing
  * ([[Multimodal.sampleChunks]]). No codec involved — byte lengths and
  * chunk arithmetic are metadata-only, so DuckDB can restate them exactly,
  * giving the multimodal pipeline its first hash-checked correctness row.
  */
object MultimodalOps {

  private val ChunkBytes = 64
  private val EveryK = 2

  /** Synthesized media frame: doc text as payload, type from doc_id mod 3. */
  def mediaFromDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Per-type stats over every-k-th sampled chunk: media counts, sampled
    * chunk counts, sampled byte totals (the last chunk may be partial —
    * substr truncates at payload end, mirrored by least() in the oracle).
    */
  def q83MediaStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleChunks(mediaFromDocs(spark, dir), ChunkBytes, EveryK)
      .groupBy(col("media_type"))
      .agg(
        countDistinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_sampled_chunks"),
        sum(length(col("chunk"))).as("sampled_bytes"))
      .orderBy(col("media_type"))

  val q83Sql: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |    octet_length(encode(text)) AS len
       |  FROM documents),
       |c AS (
       |  SELECT media_id, media_type, len,
       |    unnest(range(0, CAST(ceil(len / $ChunkBytes.0) AS BIGINT), $EveryK)) AS off
       |  FROM m)
       |SELECT media_type, count(DISTINCT media_id) AS n_media,
       |  count(*) AS n_sampled_chunks,
       |  CAST(sum(least($ChunkBytes, len - off * $ChunkBytes)) AS BIGINT) AS sampled_bytes
       |FROM c GROUP BY media_type ORDER BY media_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_media_stats" -> q83MediaStats _)

  val oracles: Map[String, String] = Map(
    "q83_media_stats" -> q83Sql)
}
