package graft

import java.nio.file.Files

import graft.sources.AvroIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** B3 closure ([[graft.sources.AvroIO]]): avro container write→read on
  * avro-core alone — type fidelity across the whole supported matrix,
  * multi-file reads, null handling, and loud refusal outside the
  * supported set.
  */
class AvroSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("roundtrip: every supported type, nulls included, multi-file") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, "x", true, Array[Byte](1, 2),
        java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")),
      Row(null, null, null, null, null, null, null, null, null),
      Row(-9L, -8, -7.25, -6.5f, "émoji ✓", false, Array[Byte](),
        java.sql.Date.valueOf("1969-07-20"),
        java.sql.Timestamp.valueOf("1969-07-20 20:17:40.123456")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("graft_avro_rt").toString + "/t"
    AvroIO.write(df, dir)
    assert(graft.io.Fs.listDir(java.nio.file.Paths.get(dir))
      .count(_.getFileName.toString.endsWith(".avro")) == 2,
      "one container per partition")
    val back = AvroIO.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // binary columns compare by content
    val norm = (r: Row) => r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    }
    assert(back.collect().map(norm).toSet == rows.map(norm).toSet)
  }

  test("pre-epoch sub-second timestamps keep exact micros") {
    // 1969 instants have negative epoch seconds with positive nanos —
    // the floorDiv/floorMod decode must reproduce them exactly
    val ts = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.000001")
    val schema = StructType(Seq(StructField("ts", TimestampType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(ts)), 1), schema)
    val dir = Files.createTempDirectory("graft_avro_neg").toString + "/t"
    AvroIO.write(df, dir)
    assert(AvroIO.read(spark, dir).collect().head.getTimestamp(0) == ts)
  }

  test("unsupported column types refuse loudly at write") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("k", "arr")
    val e = intercept[IllegalArgumentException] {
      AvroIO.write(df, Files.createTempDirectory("graft_avro_bad").toString + "/t")
    }
    assert(e.getMessage.contains("does not support"))
  }

  test("the orders fixture roundtrips losslessly (q_avro_scan's ground truth)") {
    val src = graft.io.Tables.orders(spark, TestSpark.sf001)
    val dir = Files.createTempDirectory("graft_avro_ord").toString + "/t"
    AvroIO.write(src.repartition(3), dir)
    val back = AvroIO.read(spark, dir)
    assert(back.count() == src.count())
    assert(back.collect().toSet == src.collect().toSet)
  }
}
