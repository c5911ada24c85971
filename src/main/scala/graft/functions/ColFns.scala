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
}
