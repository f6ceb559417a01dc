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

  test("publishGated commits clean data and quarantine in ONE version") {
    import graft.ops.Sinks
    val root = java.nio.file.Files.createTempDirectory("graft_gate").toString + "/t"
    val v = Sinks.publishGated(df, root, None, rules)
    assert(v == 0L)
    // clean side is the table; quarantine rides the same version
    val data = Sinks.readCurrent(spark, root)
    assert(data.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    assert(!data.columns.contains("_violations"))
    val quar = Sinks.readQuarantine(spark, root, v).get
    assert(quar.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L, 5L))
    assert(quar.columns.contains("_violations"))
    // ungated publishes report no quarantine
    val v1 = Sinks.publishVersioned(data, root, Some(v))
    assert(Sinks.readQuarantine(spark, root, v1).isEmpty)
  }

  test("gate crash window: a failure after the quarantine write publishes NOTHING") {
    // The hazard the gate-on-write design removes: with split + two
    // separate writes, a crash between them publishes unclean data or
    // loses the rejects. Here the commit is the stage rename, so a
    // failure after the data AND quarantine writes (injected via a
    // change feed that throws at evaluation) must leave no new version,
    // no visible quarantine, and no leaked staging dir.
    import graft.ops.Sinks
    val root = java.nio.file.Files.createTempDirectory("graft_gatecrash").toString + "/t"
    Sinks.publishGated(df, root, None, rules)
    val before = Sinks.currentVersion(root)
    val poison = df.withColumn("_change_type",
      when(lit(true), raise_error(lit("injected crash"))).otherwise(lit("x")))
    intercept[Exception] {
      Sinks.publishGated(df, root, before, rules, changeFeed = Some(poison))
    }
    assert(Sinks.currentVersion(root) == before, "a failed gated publish moved the pointer")
    assert(Sinks.readQuarantine(spark, root, before.get.longValue() + 1).isEmpty,
      "half-committed quarantine visible")
    val leaked = graft.io.Fs.listDir(java.nio.file.Paths.get(root))
      .filter(_.getFileName.toString.startsWith(".stage-"))
    assert(leaked.isEmpty, s"staging dirs leaked: $leaked")
  }

  test("Merge.applyTo with rules quarantines violating delta rows atomically") {
    import spark.implicits._
    import graft.ops.{Merge, Sinks}
    val root = java.nio.file.Files.createTempDirectory("graft_gatemerge").toString + "/t"
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "value", "status")
    Sinks.publishVersioned(base, root)
    val delta = Seq(
      (1L, 11.0, "a", "upsert"),   // clean update
      (2L, -99.0, "b", "upsert"),  // violates nonneg → quarantined, NOT applied
      (3L, 30.0, "c", "upsert"))   // clean insert
      .toDF("id", "value", "status", "op")
    val mergeRules = Seq(Expect.rule("nonneg", col("value") >= 0))
    val v = Merge.applyTo(spark, root, delta, Seq("id"), "op",
      emitChanges = false, statsCols = Nil, rules = mergeRules)
    val got = Sinks.readCurrent(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)),
      s"quarantined row leaked into the merge: $got")
    val quar = Sinks.readQuarantine(spark, root, v).get
    assert(quar.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(quar.select("_violations").head().getSeq[String](0) == Seq("nonneg"))
  }
}
