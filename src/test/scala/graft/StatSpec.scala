package graft

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataFrameStatFunctions + sampling surface — the statistics and
  * train/test-split operators a training-data pipeline leans on.
  * All seeded => deterministic across runs.
  */
class StatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  test("crosstab produces the full contingency table with exact counts") {
    import spark.implicits._
    val ct = Tables.orders(spark, sf001)
      .stat.crosstab("o_orderstatus", "o_orderpriority")
    assert(ct.count() == 3) // F, O, P
    val fUrgent = ct.filter($"o_orderstatus_o_orderpriority" === "F")
      .select("1-URGENT").as[Long].head()
    val exact = Tables.orders(spark, sf001)
      .filter($"o_orderstatus" === "F" && $"o_orderpriority" === "1-URGENT").count()
    assert(fUrgent == exact)
  }

  test("freqItems finds every genuinely frequent value") {
    import spark.implicits._
    val fi = Tables.orders(spark, sf001)
      .stat.freqItems(Seq("o_orderstatus"), 0.2)
      .select($"o_orderstatus_freqItems").as[Seq[String]].head().toSet
    // statuses with support >= 20% must be present (freqItems may
    // over-report, never under-report)
    val n = Tables.orders(spark, sf001).count()
    val genuine = Tables.orders(spark, sf001).groupBy("o_orderstatus").count()
      .filter($"count" >= n * 0.2).select("o_orderstatus").as[String].collect().toSet
    assert(genuine.subsetOf(fi), s"missing frequent items: ${genuine -- fi}")
  }

  test("sampleBy stratifies with per-key fractions (seeded, deterministic)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001)
    val fractions = Map("en" -> 0.5, "de" -> 0.1, "zh" -> 1.0)
    val s1 = docs.stat.sampleBy("lang", fractions, seed = 7L)
    val s2 = docs.stat.sampleBy("lang", fractions, seed = 7L)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty, "not deterministic")
    val byLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.keySet.subsetOf(fractions.keySet), "unsampled stratum leaked")
    assert(byLang("zh") == total("zh"), "fraction 1.0 must keep every row")
    val enRatio = byLang("en").toDouble / total("en")
    assert(enRatio > 0.3 && enRatio < 0.7, s"en ratio $enRatio far from 0.5")
  }

  test("randomSplit partitions the data completely and disjointly (seeded)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001)
    val Array(train, test) = docs.randomSplit(Array(0.8, 0.2), seed = 42L)
    assert(train.count() + test.count() == docs.count())
    assert(train.join(test, Seq("doc_id"), "inner").count() == 0, "overlap between splits")
    val r = train.count().toDouble / docs.count()
    assert(r > 0.7 && r < 0.9, s"train ratio $r far from 0.8")
    // deterministic under the same seed
    val Array(train2, _) = docs.randomSplit(Array(0.8, 0.2), seed = 42L)
    assert(train.exceptAll(train2).isEmpty)
  }

  test("HLL sketch union estimate tracks the exact distinct count (q_hll_union)") {
    import spark.implicits._
    val row = graft.SparkEntry.queries("q_hll_union")(spark, sf001)
      .select(col("est_union").cast("double"), col("exact_total").cast("double"))
      .as[(Double, Double)].head()
    val (est, exact) = row
    assert(exact > 0)
    assert(math.abs(est - exact) / exact < 0.05,
      s"HLL union estimate $est vs exact $exact (>5% off)")
    // the merge is also exercised piecewise: unioning per-source sketches
    // must estimate the same universe as one global sketch
    val global = Tables.documents(spark, sf001)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id))").cast("double"))
      .as[Double].head()
    assert(math.abs(est - global) / global < 0.02,
      s"piecewise union $est vs single sketch $global diverge")
  }

  test("approx_top_k accumulate/combine merge equals the single-pass sketch") {
    import spark.implicits._
    val ev = Tables.events(spark, sf001)
    // partial sketches per shard, combined — the distributed lifecycle
    val merged = ev.withColumn("shard", pmod(col("user_id"), lit(4)))
      .groupBy("shard")
      .agg(expr("approx_top_k_accumulate(event_type, 10)").as("st"))
      .agg(expr("approx_top_k_estimate(approx_top_k_combine(st, 10), 3)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count")).as[(String, Long)]
      .collect().toMap
    val direct = ev.agg(expr("approx_top_k(event_type, 3)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count")).as[(String, Long)]
      .collect().toMap
    assert(merged == direct, s"merged $merged vs direct $direct")
  }

  test("approxQuantile brackets the exact quantiles at the stated error") {
    val li = Tables.lineitem(spark, TestSpark.sf01)
    val Array(q25, q50, q75) =
      li.stat.approxQuantile("l_extendedprice", Array(0.25, 0.5, 0.75), 0.01)
    import spark.implicits._
    val exact = li.select(expr(
      "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))"))
      .as[Seq[Double]].head()
    Seq(q25, q50, q75).zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
    }
  }
}
