package graft.io

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file source/sink built directly on the core
  * `org.apache.avro` library (on Spark's classpath) — the external
  * `spark-avro` datasource module is not installed in this
  * environment, so the remaining common interchange format is wired
  * up by hand: a distributed per-partition writer (each task streams
  * its rows into one `.avro` container through the Hadoop
  * FileSystem — no driver involvement) and a distributed reader
  * (binaryFile listing + per-file `DataFileReader` decode inside
  * `mapPartitions`).
  *
  * Scale notes: write parallelism = input partitions, read
  * parallelism = files (one task per container; Avro blocks are
  * further splittable, but file granularity is the right unit when
  * the WRITER also targets ~128 MiB containers — pair with
  * [[PartitionedWriter.sizeAdaptive]]). Schema is explicit on read
  * (the repo-wide no-inference stance): the caller states the
  * StructType, and field resolution is BY NAME against the writer
  * schema embedded in each container, so column reorder or benign
  * widening on the writer side cannot silently shift values.
  *
  * Type surface: the primitive closure the engine's tables need —
  * long/int/double/float/boolean/string/binary, timestamps (micros
  * logical type, both instant and ntz flavors), date (days logical
  * type); any field nullable via union(null, T).
  */
object Avro {

  // ---- Spark schema -> Avro schema ----

  def avroSchemaOf(st: StructType, recordName: String = "row"): Schema = {
    val fields = st.fields.toSeq.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType | TimestampNTZType =>
          val s = Schema.create(Schema.Type.LONG)
          s.addProp("logicalType",
            if (f.dataType == TimestampType) "timestamp-micros"
            else "local-timestamp-micros")
          s
        case DateType =>
          val s = Schema.create(Schema.Type.INT)
          s.addProp("logicalType", "date")
          s
        case other => sys.error(s"Avro sink: unsupported type ${other.simpleString}")
      }
      val sch = if (f.nullable)
        Schema.createUnion(Seq(Schema.create(Schema.Type.NULL), base).asJava)
      else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.asJava)
  }

  // ---- value conversions (executor-side) ----

  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (t: java.sql.Timestamp, TimestampType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case (i: java.time.Instant, TimestampType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
    case (l: java.time.LocalDateTime, TimestampNTZType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(l)
    case (d: java.sql.Date, DateType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d)
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (s: String, StringType) => s
    case (x, _) => x
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(l)
    case (l: java.lang.Long, TimestampNTZType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToLocalDateTime(l)
    case (i: java.lang.Integer, DateType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(i)
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (x, _) => x
  }

  // ---- distributed write ----

  /** Write `df` as Avro container files under `path`, one file per
    * non-empty input partition, streamed task-side through the Hadoop
    * FileSystem. Overwrites the directory.
    *
    * Task commit: each attempt writes to an attempt-unique `.tmp` name
    * and renames into place on success — a retried or speculative
    * attempt can never interleave bytes into a committed container;
    * the first rename wins and the loser deletes its temp. Executors
    * use the DRIVER's Hadoop configuration (broadcast), so object-store
    * credentials / custom fs impls set on the session reach the tasks.
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val sparkSchema = df.schema
    val schemaJson = avroSchemaOf(sparkSchema).toString
    // clear the target like mode("overwrite") would
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val part = new Path(path, f"part-$pid%05d.avro")
        val tmp = new Path(path, f"part-$pid%05d-${tc.taskAttemptId()}.tmp")
        val efs = part.getFileSystem(confBc.value.value)
        val out = efs.create(tmp, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < sparkSchema.length) {
              rec.put(sparkSchema(i).name,
                toAvro(row.get(i), sparkSchema(i).dataType))
              i += 1
            }
            w.append(rec)
          }
        } finally w.close() // also closes the stream
        // first attempt to rename wins; a speculative loser cleans up
        if (!efs.rename(tmp, part)) { efs.delete(tmp, false); () }
      }
    }
    // sweep temp files of failed mid-write attempts
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".tmp"))
      .foreach(s => fs.delete(s.getPath, false))
    // An all-empty frame writes no task files (tasks skip empty
    // iterators); land one zero-record container so the directory
    // still carries the schema and a later read round-trips instead
    // of failing on an empty glob.
    if (fs.listStatus(p).forall(!_.getPath.getName.endsWith(".avro"))) {
      val schema = new Schema.Parser().parse(schemaJson)
      val out = fs.create(new Path(p, "part-empty.avro"), true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      w.close()
    }
  }

  // ---- distributed read ----

  /** Read the Avro containers under `path` into rows of `schema`
    * (explicit schema-on-read; fields resolved BY NAME against each
    * file's embedded writer schema). One task per file via the
    * binaryFile source.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val bin = spark.read.format("binaryFile").load(s"$path/*.avro")
      .select("content")
    bin.mapPartitions { files =>
      files.flatMap { fileRow =>
        val bytes = fileRow.getAs[Array[Byte]](0)
        val reader = new DataFileReader[GenericRecord](
          new org.apache.avro.file.SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(schema.fields.toSeq.map { f =>
              val v = if (rec.getSchema.getField(f.name) != null) rec.get(f.name) else null
              fromAvro(v, f.dataType)
            })
          }
        }
      }
    }(Encoders.row(schema))
  }
}
