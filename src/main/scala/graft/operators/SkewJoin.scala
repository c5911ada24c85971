package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (large) side, explode the small
  * side across all salt values, join on (key, salt).
  *
  * AQE's skew-join handling covers sort-merge joins automatically; explicit
  * salting remains the tool when (a) the small side is too big to broadcast
  * but small enough to replicate `salt` times, and (b) one key dominates so
  * hard that a single post-split partition still exceeds executor memory.
  * Salting turns one hot partition into `saltFactor` even ones at the cost
  * of replicating the other side `saltFactor` times.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed on `bigKey`) with `small`. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt: stable under retries, unlike rand()
    val salted = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id(), col(bigKey)), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
