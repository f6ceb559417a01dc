package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro CONTAINER file IO built directly on avro-core (round-14; closes
  * SURVEY B3's documented gap): the external `spark-avro` connector is
  * not on this classpath and there is no egress to fetch it, but Spark
  * itself ships `avro-1.12` — the container format (header schema +
  * sync-marked blocks) needs nothing else.
  *
  * Scale shape: the writer emits one container per partition through
  * `foreachPartition` (shared-FS assumption, the same one the versioned
  * sink makes); the reader lists `*.avro` files, reads ONE header on
  * the driver for the schema, and streams records executor-side — one
  * task per file, no driver data. This is deliberately an RDD bridge,
  * not a DataSourceV2: per-record imperative decode is the documented
  * mapPartitions-as-last-resort case, and everything downstream is a
  * normal DataFrame.
  *
  * Type fidelity (what q_avro_scan hash-proves end to end): long/int,
  * double/float, string, boolean, bytes, DATE (int + `date` logical),
  * TIMESTAMP (long + `timestamp-micros` logical) — each nullable via
  * the `[null, T]` union. Anything else refuses loudly at write time.
  */
object AvroIO {

  import org.apache.avro.{LogicalTypes, Schema}
  import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
  import org.apache.avro.file.{DataFileReader, DataFileWriter}

  private def avroFieldType(dt: DataType, name: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case StringType => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case other => throw new IllegalArgumentException(
      s"AvroIO does not support column $name of type $other — " +
        "supported: long/int/double/float/string/boolean/binary/date/timestamp/timestamp_ntz")
  }

  /** The avro record schema of a Spark schema — every field nullable
    * via the `[null, T]` union (Spark columns are nullable by default,
    * and a tighter union buys nothing here).
    */
  def avroSchemaFor(schema: StructType, recordName: String = "row"): Schema = {
    import scala.jdk.CollectionConverters._
    val fields = schema.fields.map { f =>
      val u = Schema.createUnion(java.util.List.of(
        Schema.create(Schema.Type.NULL), avroFieldType(f.dataType, f.name)))
      new Schema.Field(f.name, u, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(recordName, null, "graft.avro", false,
      fields.toSeq.asJava)
  }

  /** Spark schema of an avro record schema (the reader's inverse —
    * accepts exactly what [[avroSchemaFor]] emits, plus bare non-union
    * fields from other writers).
    */
  private def sparkSchemaFor(avro: Schema): StructType = {
    import scala.jdk.CollectionConverters._
    def base(s: Schema): Schema =
      if (s.getType != Schema.Type.UNION) s
      else s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(
        throw new IllegalArgumentException("union of only null"))
    StructType(avro.getFields.asScala.map { f =>
      val b = base(f.schema())
      val dt = (b.getType, Option(b.getLogicalType)) match {
        case (Schema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) =>
          TimestampType
        case (Schema.Type.LONG, Some(_: LogicalTypes.LocalTimestampMicros)) =>
          TimestampNTZType
        case (Schema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
        case (Schema.Type.LONG, _) => LongType
        case (Schema.Type.INT, _) => IntegerType
        case (Schema.Type.DOUBLE, _) => DoubleType
        case (Schema.Type.FLOAT, _) => FloatType
        case (Schema.Type.STRING, _) => StringType
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.BYTES, _) => BinaryType
        case (t, _) => throw new IllegalArgumentException(
          s"AvroIO cannot read avro type $t (field ${f.name})")
      }
      StructField(f.name, dt, nullable = true)
    }.toSeq)
  }

  private def toAvroValue(v: Any): Any = v match {
    case null => null
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong)
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong)
    case l: java.time.LocalDateTime =>
      Math.addExact(Math.multiplyExact(
        l.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
        (l.getNano / 1000).toLong)
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other // long/int/double/float/boolean/string direct
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (us: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us.longValue(), 1000000L),
        Math.floorMod(us.longValue(), 1000000L) * 1000L))
    case (us: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us.longValue(), 1000000L),
        (Math.floorMod(us.longValue(), 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue()))
    case (s: CharSequence, StringType) => s.toString
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (other, _) => other
  }

  /** Write `df` as avro container files under `dir` (overwrite) — one
    * `part-<partition>.avro` per task via the shared FS.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = avroSchemaFor(schema).toString // Schema: ship as JSON
    graft.io.Fs.deleteRecursively(Paths.get(dir))
    Files.createDirectories(Paths.get(dir))
    df.foreachPartition { (it: Iterator[Row]) =>
      val avSchema = new Schema.Parser().parse(avroJson)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val f = new java.io.File(dir, f"part-$pid%05d.avro")
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avSchema))
      writer.create(avSchema, f)
      try it.foreach { row =>
        val rec = new GenericData.Record(avSchema)
        var i = 0
        while (i < schema.length) {
          rec.put(schema(i).name, toAvroValue(row.get(i)))
          i += 1
        }
        writer.append(rec)
      } finally writer.close()
    }
  }

  /** Read a directory of avro container files as a DataFrame: the
    * schema comes from ONE header read on the driver (containers are
    * self-describing); record decode streams executor-side, one task
    * per file.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = graft.io.Fs.listDir(Paths.get(dir))
      .filter(_.getFileName.toString.endsWith(".avro"))
      .map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    readFiles(spark, files)
  }

  /** [[read]] over an EXPLICIT file list — the COPY INTO ingestion
    * shape, where the receipt dedupe decides which landing-zone files
    * are new before anything is opened.
    */
  def readFiles(spark: SparkSession, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "readFiles requires at least one file")
    val header = new DataFileReader[GenericRecord](
      new java.io.File(files.head), new GenericDatumReader[GenericRecord]())
    val avSchema = try header.getSchema finally header.close()
    val sparkSchema = sparkSchemaFor(avSchema)
    val avroJson = avSchema.toString
    val n = sparkSchema.length
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 32)))
      .flatMap { f =>
        val sch = new Schema.Parser().parse(avroJson)
        val reader = new DataFileReader[GenericRecord](
          new java.io.File(f), new GenericDatumReader[GenericRecord](sch))
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) {
              vals(i) = fromAvroValue(rec.get(sparkSchema(i).name),
                sparkSchema(i).dataType)
              i += 1
            }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
