package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** AVRO SOURCE/SINK built directly on the Avro container-file API —
  * the interchange format every Kafka-adjacent ingest meets first.
  *
  * Spark's optional `spark-avro` module isn't on this classpath, so this
  * is the format implemented from the public Avro core jars instead of a
  * one-line `.format("avro")`: the SINK writes one Avro object-container
  * file per partition (executors write in parallel through the Hadoop
  * FileSystem API, so the same code targets local disk, HDFS, or an
  * object store by URI); the SOURCE lists the container files and
  * distributes whole files across tasks (Avro container files are
  * block-compressed and self-describing — the file is the natural split
  * here, exactly how `FileInputFormat`-era Avro jobs shaped it).
  *
  * Schema mapping covers the flat relational subset the engine's tables
  * use (long/int/double/float/boolean/string/binary, each nullable via
  * the standard `["null", T]` union). Row order within a partition is
  * preserved; file order is by partition id.
  *
  * Scale: writes are embarrassingly parallel (no driver data movement,
  * one snappy-compressed container per task); reads parallelize across
  * files, so read parallelism = write parallelism — repartition before
  * writing to re-shape. Nothing ever collects to the driver.
  */
object AvroIO {

  /** StructType → Avro record schema (nullable fields as union with null). */
  def avroSchema(schema: StructType, name: String = "spark_row"): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other =>
          throw new IllegalArgumentException(
            s"AvroIO: unsupported column type $other for field ${f.name}")
      }
      if (f.nullable)
        fs.name(f.name).`type`(Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), base)))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  private def toAvro(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case x => x // long/int/double/float/boolean/String pass through
  }

  private def fromAvro(v: Any): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case x => x
  }

  /** Write `df` as a directory of Avro object-container files, one per
    * partition, snappy-compressed. Executor-parallel; driver only creates
    * the directory and the schema string.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avroJson = avroSchema(schema).toString // Schema isn't serializable: ship JSON
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    dir.getFileSystem(hconf.value).mkdirs(dir)
    df.foreachPartition { rows: Iterator[Row] =>
      val pid = TaskContext.getPartitionId()
      val sch = new Schema.Parser().parse(avroJson)
      val file = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
      val out = file.getFileSystem(hconf.value).create(file, true)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      w.create(sch, out)
      try
        rows.foreach { r =>
          val rec = new GenericData.Record(sch)
          var i = 0
          while (i < r.length) { rec.put(i, toAvro(r.get(i))); i += 1 }
          w.append(rec)
        }
      finally w.close() // closes the underlying stream
    }
  }

  /** Read a directory of Avro container files back as a DataFrame with
    * `schema`. Whole files distribute across tasks (container files are
    * the split unit); each task streams its files record-by-record.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    val files = dir.getFileSystem(hconf.value).listStatus(dir)
      .map(_.getPath.toString)
      .filter(_.endsWith(".avro")).sorted.toSeq
    val n = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val fieldCount = schema.fields.length
    val rows = spark.sparkContext.parallelize(files, n).flatMap { f =>
      val in = new org.apache.avro.mapred.FsInput(
        new org.apache.hadoop.fs.Path(f), hconf.value)
      val rdr = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      new Iterator[Row] {
        def hasNext: Boolean = { val h = rdr.hasNext; if (!h) rdr.close(); h }
        def next(): Row = {
          val rec = rdr.next()
          Row.fromSeq((0 until fieldCount).map(i => fromAvro(rec.get(i))))
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
