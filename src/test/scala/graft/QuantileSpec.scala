package graft

import graft.functions.{QuantileAgg, QuantileSketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic mergeable quantile sketch: exact under k, bounded rank
  * error above it (including adversarial input orders), deterministic,
  * merge-law sound, and correct through the SQL aggregate path.
  */
class QuantileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val K = 200

  /** Observed rank error of the sketch's answer at quantile q, as a
    * fraction of n (0 = perfect).
    */
  private def rankErr(data: Seq[Double], q: Double): Double = {
    val sk = QuantileSketch.of(data, K)
    val est = sk.quantile(q)
    val sorted = data.sorted
    val rank = sorted.count(_ <= est)
    math.abs(rank - q * data.size) / data.size
  }

  test("exact for n <= k (no compaction has happened)") {
    val data = (1 to 150).map(_.toDouble).reverse
    val sk = QuantileSketch.of(data, K)
    assert(sk.quantile(0.0) == 1.0)
    assert(sk.quantile(0.5) == 76.0)
    assert(sk.quantile(1.0) == 150.0)
  }

  test("rank error stays under 1% at n=20000 across adversarial orders") {
    val n = 20000
    val uniform = (1 to n).map(_.toDouble)
    val orders = Map(
      "sorted" -> uniform,
      "reversed" -> uniform.reverse,
      // genuinely alternating low/high halves (grouped(2).flatten would
      // be the identity — a do-nothing "interleave")
      "interleaved" -> uniform.take(n / 2).zip(uniform.drop(n / 2).reverse)
        .flatMap { case (lo, hi) => Seq(lo, hi) },
      "blocky" -> uniform.grouped(1000).toSeq.reverse.flatten)
    for ((name, data) <- orders; q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val e = rankErr(data, q)
      assert(e <= 0.01, f"$name q=$q rank error $e%.4f exceeds 1%%")
    }
  }

  test("deterministic: identical input order produces an identical sketch") {
    val data = (1 to 5000).map(i => (i * 2654435761L % 100000).toDouble)
    assert(QuantileSketch.of(data, K) == QuantileSketch.of(data, K))
  }

  test("merge law: merged shard sketches answer within the same error bound") {
    val n = 10000
    val data = (1 to n).map(i => (i * 48271L % 65537).toDouble)
    val (a, b) = data.splitAt(n / 3)
    val merged = QuantileSketch.of(a, K).merge(QuantileSketch.of(b, K))
    assert(merged.count == n)
    val sorted = data.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantile(q)
      val rank = sorted.count(_ <= est)
      assert(math.abs(rank - q * n) <= 0.015 * n,
        s"merged sketch q=$q rank off by ${math.abs(rank - q * n)}")
    }
    // merging an empty sketch is the identity on answers
    val withEmpty = QuantileSketch.of(data, K).merge(QuantileSketch.empty(K))
    assert(withEmpty.count == n)
    // mismatched k is a hard error, not silent degradation
    intercept[IllegalArgumentException] {
      QuantileSketch.empty(8).merge(QuantileSketch.empty(16))
    }
  }

  test("SQL aggregate path: grouped sketch quantiles track exact percentiles") {
    import spark.implicits._
    val df = (1 to 9000).map(i => (s"g${i % 3}", (i % 3000).toDouble))
      .toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(QuantileAgg(col("v"), Seq(0.5, 0.9)).as("approx"),
        expr("percentile(v, array(0.5, 0.9))").as("exact"))
      .collect()
    assert(got.length == 3)
    got.foreach { r =>
      val approx = r.getSeq[Double](1)
      val exact = r.getSeq[Double](2)
      approx.zip(exact).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 0.02 * 3000,
          s"group ${r.getString(0)}: approx $a vs exact $e")
      }
    }
  }
}
