package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Parquet is the engine's canonical columnar source: Spark's
  * `ParquetFileFormat` gives predicate pushdown, column pruning and
  * partition-parallel scans for free — the 100 TB scan path is "read only the
  * columns and row-groups the plan needs", never a full materialization.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the legacy conf and
    * convert to a microsecond TimestampType with integer floor-division —
    * the same ns->us truncation DuckDB's epoch_us applies, so oracle
    * comparisons stay exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000L")))
  }
}
