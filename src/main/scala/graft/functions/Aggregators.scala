package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregations (the §2b UDAF surface) as `Aggregator`s:
  * merge-able intermediate buffers, so Spark runs them partial-then-final
  * like any built-in agg — map-side combine, one shuffle of small buffers.
  */
object Aggregators {

  /** Numerically stable streaming mean/variance (Welford + Chan's parallel
    * merge) — the canonical "can't express with sum/count alone" UDAF.
    */
  final case class MomentsBuf(n: Long, mean: Double, m2: Double)
  final case class Moments(n: Long, mean: Double, variance: Double, stddev: Double)

  object WelfordVariance extends Aggregator[Double, MomentsBuf, Moments] {
    override def zero: MomentsBuf = MomentsBuf(0L, 0.0, 0.0)

    override def reduce(b: MomentsBuf, x: Double): MomentsBuf = {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      MomentsBuf(n, mean, b.m2 + delta * (x - mean))
    }

    override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        MomentsBuf(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }
    }

    override def finish(b: MomentsBuf): Moments = {
      val variance = if (b.n < 2) 0.0 else b.m2 / (b.n - 1)
      Moments(b.n, b.mean, variance, math.sqrt(variance))
    }

    override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Bounded distinct sample per group (sorted, comma-joined) — a mergeable
    * set buffer with a size cap (exact below the cap, deterministic above
    * it by keeping the k smallest).
    */
  final class BoundedDistinct(k: Int) extends Aggregator[String, Set[String], String] {
    override def zero: Set[String] = Set.empty
    override def reduce(b: Set[String], x: String): Set[String] =
      (b + x).toSeq.sorted.take(k).toSet
    override def merge(a: Set[String], b: Set[String]): Set[String] =
      (a ++ b).toSeq.sorted.take(k).toSet
    override def finish(r: Set[String]): String = r.toSeq.sorted.mkString(",")
    override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
