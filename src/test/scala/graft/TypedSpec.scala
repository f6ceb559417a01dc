package graft

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset[T] surface (SURVEY §1.2: "Dataset[T] with case-class
  * Encoders where type safety helps"): the compile-time-checked API must
  * agree with the untyped DataFrame plans it desugars to. Typed lambdas
  * black-box Catalyst (no pushdown through them), so the library uses
  * them only at the edges — these specs pin the semantics, and the
  * equality assertions double as documentation of the desugaring.
  */
case class LiRow(l_orderkey: Long, l_returnflag: String, l_quantity: Double)
case class OrdRow(o_orderkey: Long, o_totalprice: Double)

class TypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  private def li = {
    import spark.implicits._
    Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_returnflag", "l_quantity").as[LiRow]
  }

  test("typed filter + groupByKey/mapGroups equals the untyped aggregation") {
    import spark.implicits._
    val typed = li.filter(_.l_quantity > 10)
      .groupByKey(_.l_returnflag)
      .mapGroups((k, it) => (k, it.map(_.l_quantity).sum))
      .toDF("l_returnflag", "sum_qty")
    val untyped = Tables.lineitem(spark, sf001)
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("sum_qty"))
    assert(typed.exceptAll(untyped).isEmpty && untyped.exceptAll(typed).isEmpty)
  }

  test("typed map/flatMap preserve row multiplicity and values") {
    import spark.implicits._
    val doubled = li.map(r => r.copy(l_quantity = r.l_quantity * 2))
    assert(doubled.count() == li.count())
    // fixture quantities are integral doubles, so the sums are exact
    val sumRaw = li.agg(sum("l_quantity")).head().getDouble(0)
    val sumDoubled = doubled.agg(sum("l_quantity")).head().getDouble(0)
    assert(sumDoubled == 2 * sumRaw)
    val exploded = li.flatMap(r => Seq(r, r))
    assert(exploded.count() == 2 * li.count())
  }

  test("joinWith produces typed pairs matching the untyped join cardinality") {
    import spark.implicits._
    val left = li
    val ords = Tables.orders(spark, sf001)
      .select("o_orderkey", "o_totalprice").as[OrdRow]
    val pairs = left.joinWith(ords, left("l_orderkey") === ords("o_orderkey"), "inner")
    val untypedCount = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(pairs.count() == untypedCount)
    // the pair really is typed: fields are accessible post-join
    val sample = pairs.head()
    assert(sample._1.l_orderkey == sample._2.o_orderkey)
  }

  test("typed Aggregator (WeightedMean) usable as a TypedColumn over a Dataset") {
    import spark.implicits._
    val agg = graft.functions.WeightedMean.toColumn
    val ds = Tables.lineitem(spark, sf001)
      .select(col("l_extendedprice"), col("l_quantity"))
      .as[(Double, Double)]
    val typedResult = ds.select(agg).head()
    val algebraic = Tables.lineitem(spark, sf001)
      .agg((sum(col("l_extendedprice") * col("l_quantity")) /
        sum(col("l_quantity"))).as("wm"))
      .head().getDouble(0)
    assert(math.abs(typedResult - algebraic) / algebraic < 1e-9)
  }
}
