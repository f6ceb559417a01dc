package graft

import graft.ops.Expect
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-quality expectations (B112): exact violation attribution, a
  * complete and disjoint split, null-means-violation semantics, and the
  * one-scan stats shape.
  */
class ExpectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(-5.0), "ok"),     // fails nonneg
      (3L, None, "ok"),           // null value → fails nonneg (null rule)
      (4L, Some(20.0), "bad"),    // fails status
      (5L, Some(-1.0), "bad")     // fails both
    ).toDF("id", "value", "status")
  }

  private val rules = Seq(
    Expect.rule("nonneg", col("value") >= 0),
    Expect.rule("status_ok", col("status") === "ok"))

  test("annotate names exactly the failed rules per row; null predicate = violation") {
    val m = Expect.annotate(df, rules).select("id", "_violations")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq())
    assert(m(2L) == Seq("nonneg"))
    assert(m(3L) == Seq("nonneg"), "a NULL predicate must count as a violation")
    assert(m(4L) == Seq("status_ok"))
    assert(m(5L) == Seq("nonneg", "status_ok"))
  }

  test("split is complete and disjoint; clean side keeps the original schema") {
    val (clean, quarantine) = Expect.split(df, rules)
    assert(clean.columns.toSeq == df.columns.toSeq)
    assert(quarantine.columns.contains("_violations"))
    assert(clean.count() + quarantine.count() == df.count())
    assert(clean.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("stats: per-rule counts from ONE scan") {
    val s = Expect.stats(df, rules).orderBy("rule").collect()
    assert(s.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == Seq(
      ("nonneg", 5L, 3L), ("status_ok", 5L, 2L)))
    assert(s.forall(r => math.abs(r.getDouble(3) - r.getLong(2).toDouble / 5) < 1e-9))
    // one scan, no shuffle beyond the single-row global aggregate
    val plan = Expect.stats(df, rules).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"stats introduced a keyed shuffle:\n$plan")
  }

  test("enforce passes a clean frame through and aborts on the first violating row") {
    import spark.implicits._
    val clean = Seq((1L, 5.0, "ok"), (2L, 6.0, "ok")).toDF("id", "value", "status")
    val cleanRules = Seq(
      Expect.rule("nonneg", col("value") >= 0),
      Expect.rule("status_ok", col("status") === "ok"))
    val passed = Expect.enforce(clean, cleanRules)
    assert(passed.columns.toSeq == clean.columns.toSeq)
    assert(passed.count() == 2)
    val err = intercept[Exception] { Expect.enforce(df, rules).count() }
    val msg = Option(err.getMessage).getOrElse("") +
      Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("expectation failed"),
      s"expected the gate's message, got: $msg")
  }

  test("guard rails: duplicate names, empty rule set, reserved column") {
    intercept[IllegalArgumentException] {
      Expect.annotate(df, rules :+ Expect.rule("nonneg", lit(true)))
    }
    intercept[IllegalArgumentException] { Expect.stats(df, Nil) }
    intercept[IllegalArgumentException] {
      Expect.annotate(df.withColumn("_violations", lit("x")), rules)
    }
  }
}
