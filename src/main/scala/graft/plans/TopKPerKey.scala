package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** A complete custom WHOLE-OPERATOR stack — logical node, planner strategy,
  * physical operator — for "top k rows per key", the third extension tier
  * from SURVEY §7.1 after composed built-ins and custom expressions.
  *
  * Why Spark's built-ins aren't enough: the idiomatic
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k` plans a
  * shuffle PLUS a full per-partition SORT of every row plus a rank
  * projection, then discards all but k rows per key. At 100 TB the sort of
  * the discarded 99.9% dominates. [[TopKPerKeyExec]] declares the same
  * `ClusteredDistribution` (so EnsureRequirements plans the one required
  * hash exchange) but replaces sort+rank with a single streaming pass
  * holding a bounded heap per key: time O(n log k) with no sort buffer,
  * memory O(distinct keys in partition × k) — the shape that survives a
  * 1000-executor scale-up.
  */
final case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Planner rule: the logical node has exactly one physical realization. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** All rows of a key must meet in one partition; EnsureRequirements
    * inserts the hash exchange (or reuses the child's partitioning when it
    * already clusters on the keys — e.g. a bucketed source).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      // codegen'd comparator following the requested sort order: rows that
      // compare SMALLER are "better" (earlier in the sorted output)
      val cmp = GenerateOrdering.generate(sortOrder, schema)
      // PriorityQueue dequeues the maximum under its Ordering; with the
      // comparator as-is the max is the WORST kept row — exactly what a
      // bounded top-k heap evicts
      val worstFirst = new Ordering[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(a, b)
      }
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row) // reused buffer: copy only on first sight
        heaps.get(key) match {
          case Some(pq) =>
            if (pq.size < limit) pq.enqueue(row.copy())
            else if (cmp.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
          case None =>
            val pq = scala.collection.mutable.PriorityQueue.empty[InternalRow](worstFirst)
            pq.enqueue(row.copy())
            heaps.put(key.copy(), pq)
        }
      }
      // per key, emit best-first (dequeueAll yields worst-first)
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }
}

/** User-facing surface. `perKey` works on any session (registers the
  * strategy via the public `spark.experimental.extraStrategies` hook);
  * cluster deployments get the same strategy from
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object TopK {

  /** Top `k` rows per `keyCols` group ordered by `orderCols`
    * ((column, ascending) pairs — give a total order, e.g. a unique
    * tiebreak column, for deterministic output).
    */
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(a => spark.sessionState.conf.resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found among ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(
      spark, TopKPerKeyNode(keyCols.map(attr), order, k, analyzed))
  }
}
