package graft

import graft.ops.Scd
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B154 incremental SCD2 maintenance: apply-changes semantics the
  * oracled split-equivalence query can't single out — multi-change
  * batches, brand-new keys, untouched keys, exactly-one-current.
  */
class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dim(rows: Seq[(Long, Long, Long, Option[Long], Boolean)]) =
    rows.toDF("user_id", "event_id", "valid_from", "valid_to", "is_current")

  test("apply closes currents at the first change, keeps intermediate versions, leaves others alone") {
    val target = dim(Seq(
      (1L, 10L, 100L, Some(200L), false), // closed history stays byte-identical
      (1L, 11L, 200L, None, true),        // current: must close at 300
      (2L, 20L, 150L, None, true)         // untouched key
    ))
    // key 1 gets TWO changes in one batch, key 3 is brand new
    val changes = Seq(
      (1L, 12L, 300L), (1L, 13L, 400L), (3L, 30L, 500L)
    ).toDF("user_id", "event_id", "ts")
    val out = Scd.applyChanges(target, changes, "user_id", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, 10L, 100L, Some(200L), false),
      (1L, 11L, 200L, Some(300L), false), // closed at the FIRST change
      (1L, 12L, 300L, Some(400L), false), // intermediate version is history
      (1L, 13L, 400L, None, true),
      (2L, 20L, 150L, None, true),        // untouched
      (3L, 30L, 500L, None, true)))       // new key inserts directly current
  }

  test("every key ends with exactly one current row") {
    val target = dim(Seq((1L, 10L, 100L, None, true)))
    val changes = Seq((1L, 11L, 200L), (2L, 20L, 50L)).toDF("user_id", "event_id", "ts")
    val currents = Scd.applyChanges(target, changes, "user_id", "ts", "event_id")
      .filter(col("is_current"))
      .groupBy("user_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(currents == Map(1L -> 1L, 2L -> 1L))
  }

  test("an empty change batch is the identity") {
    val target = dim(Seq((1L, 10L, 100L, Some(200L), false), (1L, 11L, 200L, None, true)))
    val changes = Seq.empty[(Long, Long, Long)].toDF("user_id", "event_id", "ts")
    val out = Scd.applyChanges(target, changes, "user_id", "ts", "event_id")
    assert(out.collect().toSet == target.collect().toSet)
  }
}
