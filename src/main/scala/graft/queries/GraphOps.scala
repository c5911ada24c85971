package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate candidate graph — the second
  * graph operator family beside connected components ([[Dedup.q46DedupCC]]).
  *
  * The reference has no graph surface (its pipeline is record-at-a-time,
  * `lib/batchProcessing.js`); this extends the dedup candidate machinery
  * the way a corpus-quality pipeline actually consumes it: triangle counts
  * and local clustering coefficients distinguish tight near-dup CLIQUES
  * (template spam — every member pairwise-similar) from long CHAINS of
  * incidental overlap (shared boilerplate), which connected components
  * alone cannot tell apart — both collapse to one component.
  */
object GraphOps {

  /** Edges enter the triangle pass at this signature-estimated Jaccard. */
  private[queries] val TriThreshold = 0.5

  /** Per-node triangle count + local clustering coefficient over an
    * undirected edge list (`id_a < id_b`, one row per edge).
    *
    * The degree-ordered orientation (Schank–Wagner; Suri–Vassilvitskii's
    * MapReduce formulation): each edge points from its (degree, id)-smaller
    * endpoint to its larger one, wedges are built only between a node's
    * OUT-neighbors, and a wedge is a triangle iff its closing edge exists
    * in the same oriented set. Orientation caps every out-degree at
    * O(sqrt(m)), so the wedge join — the only superlinear stage — is
    * bounded by sum(outdeg^2) <= O(m^1.5) REGARDLESS of hub degrees: a
    * node with a million near-dups (degree 10^6) contributes wedges only
    * through the few neighbors ordered above it, not deg^2 pairs. That is
    * the difference between this shape surviving a skewed 100 TB candidate
    * graph and the naive neighbor self-join that explodes on the first hub.
    *
    * Shuffle budget: degree agg, two degree-attach joins (vocab-sized right
    * side, AQE-broadcastable when small), one wedge self-join keyed on the
    * wedge center, one closing-edge join keyed on the wedge endpoints, one
    * final count — every key is (id)- or (id, id)-shaped, no row carries
    * adjacency lists.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a").as("u"), col("id_b").as("v"))
    val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient u->v iff (deg(u), u) < (deg(v), v): acyclic, out-degree O(sqrt m)
    val withDeg = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
    // wedges between out-neighbors, ordered so the closing edge is oriented
    val wedges = oriented.as("o1").join(oriented.as("o2"), col("o1.s") === col("o2.s"))
      .filter(col("o1.dt") < col("o2.dt") ||
        (col("o1.dt") === col("o2.dt") && col("o1.t") < col("o2.t")))
      .select(col("o1.s").as("a"), col("o1.t").as("b"), col("o2.t").as("c"))
    val tris = wedges.join(
      oriented.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(
        col("id").as("doc_id"),
        col("deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      // exact-int scalar math: bit-identical across engines, no rounding
      .withColumn("lcc",
        when(col("degree") >= 2,
          lit(2.0) * col("triangles") / (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  /** q101: triangle census of the MinHash near-dup graph at
    * est_jaccard >= [[TriThreshold]] — one row per incident doc with its
    * degree, triangle count, and local clustering coefficient. lcc = 1
    * flags clique-like template spam; lcc = 0 at high degree flags
    * chain/star boilerplate overlap.
    */
  def q101Triangles(spark: SparkSession, dir: String): DataFrame =
    triangleStats(Dedup.minhashCandidates(spark, dir)
      .filter(col("est_jaccard") >= TriThreshold))

  /** The oracle restates the same candidate pipeline (shared
    * [[Dedup.minhashCoreSql]] CTE chain) and the same orientation
    * arithmetic — the triangle set is exact-integer, so the whole row
    * hashes bit-identically.
    */
  val q101Sql: String =
    s"""${Dedup.minhashCoreSql},
       |edges AS (SELECT id_a AS u, id_b AS v FROM ests WHERE est_jaccard >= $TriThreshold),
       |deg AS (
       |  SELECT id, count(*) AS deg FROM (
       |    SELECT u AS id FROM edges UNION ALL SELECT v AS id FROM edges)
       |  GROUP BY id),
       |o AS (
       |  SELECT
       |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v) THEN e.u ELSE e.v END AS s,
       |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v) THEN e.v ELSE e.u END AS t,
       |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v) THEN dv.deg ELSE du.deg END AS dt
       |  FROM edges e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
       |w AS (
       |  SELECT o1.s AS a, o1.t AS b, o2.t AS c
       |  FROM o o1 JOIN o o2 ON o1.s = o2.s
       |  WHERE o1.dt < o2.dt OR (o1.dt = o2.dt AND o1.t < o2.t)),
       |tri AS (SELECT w.a, w.b, w.c FROM w JOIN o oc ON oc.s = w.b AND oc.t = w.c),
       |pernode AS (
       |  SELECT id, count(*) AS triangles FROM (
       |    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
       |  GROUP BY id)
       |SELECT d.id AS doc_id, d.deg AS degree,
       |  COALESCE(p.triangles, 0) AS triangles,
       |  CASE WHEN d.deg >= 2
       |       THEN 2.0 * COALESCE(p.triangles, 0) / (d.deg * (d.deg - 1))
       |       ELSE 0.0 END AS lcc
       |FROM deg d LEFT JOIN pernode p ON p.id = d.id
       |ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_triangles" -> q101Triangles _)

  val oracles: Map[String, String] = Map(
    "q101_triangles" -> q101Sql)
}
