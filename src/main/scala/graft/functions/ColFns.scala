package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression helpers. */
object ColFns {

  /** Bind an expensive column expression to a lambda variable so it is
    * evaluated ONCE per row, however many times the body references it.
    *
    * Catalyst's CollapseProject inlines aliased expressions into every
    * consumer, so `val sig = expensive; f(sig, sig, ...)` re-evaluates
    * `expensive` per reference (measured: minhash band keys over an inlined
    * signature ran 8x32 = 256 shingle-array builds per row — 187 s at
    * sf0.1, vs ~2 s bound). `transform(array(c), x => body)` introduces a
    * real lambda binding the optimizer cannot inline through.
    */
  def bound(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), x => body(x)), 1)

  /** md5-derived non-negative 60-bit hash — THE engine-portable hash family
    * every sampling/sharding/banding operator shares (q84 split, q97
    * shards, q57 sampling, q100 CDC boundaries, LSH band keys). DuckDB
    * restates it verbatim as `('0x' || substr(md5(x), 1, 15))::BIGINT`; the
    * 1..15 hex substring and base conversion here must stay in lockstep
    * with every one of those oracle restatements, which is why this lives
    * in exactly one place.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
}
