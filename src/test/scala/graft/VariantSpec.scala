package graft

import java.nio.file.Files

import graft.ops.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 (B197): VariantType for semi-structured columns — Spark 4's
  * binary variant encoding stored in the engine's parquet tables, typed
  * path access via `variant_get`, and the scan builder forwarding
  * variant-extraction pushdown to the parquet delegate.
  */
class VariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("variant roundtrip through the catalog table; typed paths exact; DV composes") {
    val base = Files.createTempDirectory("graft_variant").toString
    spark.conf.set("spark.sql.catalog.gvar", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvar.root", base)
    import spark.implicits._
    val root = s"$base/t"
    val src = (0 until 500).map(i =>
      (i.toLong, s"""{"k": $i, "tag": "t${i % 5}", "nested": {"d": ${i * 2}}}"""))
      .toDF("id", "js")
    Sinks.publishVersioned(
      src.select($"id", expr("parse_json(js)").as("pv")), root, None)
    val df = spark.table("gvar.t")
    assert(df.schema("pv").dataType.typeName == "variant")
    // typed scalar, string, and nested paths
    val got = df.select(
      sum(expr("variant_get(pv, '$.k', 'bigint')")).as("ks"),
      sum(expr("variant_get(pv, '$.nested.d', 'bigint')")).as("ds"),
      count(when(expr("variant_get(pv, '$.tag', 'string')") === "t3", 1)).as("t3"))
      .head
    assert(got.getLong(0) == (0 until 500).map(_.toLong).sum)
    assert(got.getLong(1) == (0 until 500).map(_ * 2L).sum)
    assert(got.getLong(2) == 100L)
    // a missing path is NULL, not an error
    assert(df.filter(expr("variant_get(pv, '$.absent', 'bigint')").isNotNull)
      .count() == 0)
    // merge-on-read DELETE composes: variant rows subtract exactly
    Sinks.deleteVector(spark, root, expr("variant_get(pv, '$.k', 'bigint')") < 100)
    assert(spark.table("gvar.t").count() == 400)
    assert(spark.read.format("graft").load(root).count() == 400,
      "the format door serves the variant table too")
  }
}
