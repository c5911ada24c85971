package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColFns.bound

/** Scalar int8 quantization for embedding columns — the storage-scale lever
  * at 100 TB: 4x smaller vectors (array<float> -> array<byte> + one float
  * scale), with symmetric per-vector max-abs scaling so dequantized cosine
  * stays within ~1% of exact. All built-in expressions (no UDF): quantized
  * search pipelines dequantize inside the same codegen'd projection.
  */
object Quantize {

  /** Per-vector scale: max |x| / 127. */
  def scaleFor(v: Column): Column =
    greatest(array_max(transform(v, x => abs(x.cast("double")))), lit(1e-12)) / 127.0

  /** Quantize to int8 (as array<tinyint>) + scale column pair. */
  def withQuantized(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.withColumn("q_scale", scaleFor(col(vecCol)))
      .withColumn("q_vec",
        bound(col("q_scale")) { s =>
          transform(col(vecCol), x => round(x.cast("double") / s).cast("tinyint"))
        })

  /** Dequantize back to array<double>. */
  def dequantize(qVec: Column, scale: Column): Column =
    bound(scale) { s => transform(qVec, b => b.cast("double") * s) }
}
