package graft

import java.nio.file.Files

import graft.ops.{Sinks, Stats, TableProps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-served NDV (B180, `'graft.ndv.columns'` + `Stats.ndv` +
  * `CALL system.ndv`): per-file HLL sketches recorded by the commit-time
  * annotator, merged at metadata scale (a deterministic driver-side
  * union in sorted file order — zero jobs). In the sketch's exact
  * coupon regime (≲1k distincts at lgK=12) the serve EQUALS a full
  * scan's `hll_sketch_agg` estimate bit-for-bit; past promotion the
  * scan's own estimate becomes merge-order-dependent (DataSketches HIP
  * estimator), so the scale-stable invariant is determinism + the
  * sketch's 3σ error bound against the exact count — both pinned here.
  */
class NdvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft_ndv").toString

  /** The ground truth: one full scan's estimate, integer-family cast to
    * long exactly as the annotator sketches it.
    */
  private def scanNdv(df: org.apache.spark.sql.DataFrame, c: String): Long = {
    val e = df.schema(df.schema.fieldIndex(c)).dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BinaryType => col(c)
      case _ => col(c).cast("long")
    }
    df.agg(hll_sketch_estimate(hll_sketch_agg(e))).head.getLong(0)
  }

  private def mkDf(n: Int) = {
    import spark.implicits._
    spark.range(0, n).select(
      ($"id" % 537).as("k"),
      concat(lit("user_"), ($"id" % 211).cast("string")).as("who"),
      $"id".as("payload"))
  }

  test("merged per-file sketches equal the full scan's estimate exactly") {
    val tbl = s"${tmp()}/t"
    TableProps.store(tbl, Map(TableProps.NdvKey -> "k,who"))
    Sinks.publishVersioned(mkDf(3000).repartition(5), tbl, None)
    val full = Sinks.readCurrent(spark, tbl)
    val served = Stats.ndv(spark, tbl, Seq("k", "who")).toMap
    assert(served("k") == scanNdv(full, "k"))
    assert(served("who") == scanNdv(full, "who"))
    // sanity: the estimate is in the right neighborhood of the truth
    assert(math.abs(served("k") - 537) < 40 && math.abs(served("who") - 211) < 20)
  }

  test("appends compose: the delta's sketches union with the carried ones") {
    val tbl = s"${tmp()}/t"
    TableProps.store(tbl, Map(TableProps.NdvKey -> "k,who"))
    Sinks.publishVersioned(mkDf(1000).repartition(3), tbl, None)
    import spark.implicits._
    val extra = spark.range(5000, 6000).select(
      $"id".as("k"), lit("newbie").as("who"), $"id".as("payload"))
    Sinks.appendVersioned(extra, tbl, Some(0L))
    val full = Sinks.readCurrent(spark, tbl)
    val served = Stats.ndv(spark, tbl, Seq("k", "who")).toMap
    // `who` (212 distincts) is still in the exact coupon regime: the
    // serve equals the scan's estimate bit-for-bit
    assert(served("who") == scanNdv(full, "who"))
    // `k` (1537 distincts) crossed the lgK=12 promotion threshold: the
    // scan's own estimate is merge-order-dependent there, so the pinned
    // invariants are determinism and the sketch's 3σ (~4.9%) bound
    assert(served("k") == Stats.ndv(spark, tbl, Seq("k")).head._2,
      "repeated serves must be byte-deterministic")
    val exactK = full.select("k").distinct().count()
    assert(math.abs(served("k").toDouble - exactK) / exactK <= 0.05,
      s"served ${served("k")} vs exact $exactK breaches the 3σ bound")
  }

  test("many-file refresh merges distributed (tree rounds), stays exact in coupon regime and byte-deterministic") {
    val tbl = s"${tmp()}/t"
    TableProps.store(tbl, Map(TableProps.NdvKey -> "k,who"))
    // 150 live files — past the 64-ary driver fold bound, so the serve
    // takes the distributed tree path (one grouped-union round, then
    // the bounded driver fold over the round's ≤64 outputs)
    Sinks.publishVersioned(mkDf(6000).repartition(150), tbl, None)
    val full = Sinks.readCurrent(spark, tbl)
    assert(graft.io.Fs.walkParquet(java.nio.file.Paths.get(Sinks.resolve(tbl)))
      .size > 64, "fixture must exceed the driver fold bound")
    val served = Stats.ndv(spark, tbl, Seq("k", "who")).toMap
    // coupon regime (537 / 211 distincts at lgK=12): every merge
    // structure is exact, so the distributed tree must land on the
    // full scan's estimate
    assert(served("k") == scanNdv(full, "k"))
    assert(served("who") == scanNdv(full, "who"))
    // and repeated serves are byte-deterministic (fixed tree shape)
    assert(Stats.ndv(spark, tbl, Seq("k", "who")).toMap == served)
  }

  test("declines on deletion vectors; compaction restores service") {
    val tbl = s"${tmp()}/t"
    TableProps.store(tbl, Map(TableProps.NdvKey -> "k"))
    Sinks.publishVersioned(mkDf(1000).repartition(3), tbl, None)
    Sinks.deleteVector(spark, tbl, col("k") < 100)
    val e = intercept[Exception](Stats.ndv(spark, tbl, Seq("k")))
    assert(e.getMessage.contains("deletion vectors") &&
      e.getMessage.contains("compact"), e.getMessage)
    Sinks.compactVersioned(spark, tbl)
    val served = Stats.ndv(spark, tbl, Seq("k")).toMap
    assert(served("k") == scanNdv(Sinks.readCurrent(spark, tbl), "k"))
  }

  test("declared-after-data declines with the retrofit remedy; annotate_stats heals") {
    val root = tmp()
    val cat = "graftndv"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES ('graft.stats.columns' = 'k') " +
      "AS SELECT id % 100 AS k, id AS payload FROM range(0, 2000)")
    val tbl = s"$root/t"
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('graft.ndv.columns' = 'k')")
    // files were annotated before the declaration: no sketches yet
    val e = intercept[Exception](Stats.ndv(spark, tbl, Seq("k")))
    assert(e.getMessage.contains("annotate_stats"), e.getMessage)
    spark.sql(s"CALL $cat.system.annotate_stats('t', columns => 'k')")
    val served = Stats.ndv(spark, tbl, Seq("k")).toMap
    assert(served("k") == scanNdv(Sinks.readCurrent(spark, tbl), "k"))
    // and the NEXT commit self-annotates its delta (O(delta) staying true)
    spark.sql(s"INSERT INTO $cat.t SELECT id AS k, id AS payload FROM range(9000, 9200)")
    val after = Stats.ndv(spark, tbl, Seq("k")).toMap
    assert(after("k") == scanNdv(Sinks.readCurrent(spark, tbl), "k"))
  }

  test("CALL system.ndv: declared columns by default; typo'd declaration refused") {
    val root = tmp()
    val cat = "graftndv2"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES ('graft.ndv.columns' = 'k,who') " +
      "AS SELECT id % 321 AS k, concat('u', id % 77) AS who FROM range(0, 4000)")
    val rows = spark.sql(s"CALL $cat.system.ndv('t')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Sinks.readCurrent(spark, s"$root/t")
    assert(rows("k") == scanNdv(full, "k") && rows("who") == scanNdv(full, "who"))
    // unsketchable type refused at CREATE, loudly, leaving no table
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.bad TBLPROPERTIES ('graft.ndv.columns' = 'd') " +
        "AS SELECT cast(id AS double) AS d FROM range(10)"))
    assert(e.getMessage.contains("graft.ndv.columns"), e.getMessage)
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.bad").collect())
  }
}
