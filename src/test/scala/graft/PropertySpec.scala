package graft

import graft.functions.WeightedMean
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Algebraic laws (SURVEY §5.2 item 3) over seeded random inputs. These
  * are the partial/final soundness guarantees Spark's distributed
  * execution relies on: reduce-then-merge must equal reduce-of-whole for
  * ANY split, or results would depend on partitioning.
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private def randomPairs(n: Int): List[(Double, Double)] =
    List.fill(n)((rnd.nextDouble() * 2e6 - 1e6, rnd.nextDouble() * 1e3 + 0.001))

  private def close(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("WeightedMean: merge of split buffers == reduce of whole (partial-agg soundness)") {
    for (_ <- 1 to 200) {
      val xs = randomPairs(1 + rnd.nextInt(50))
      val k = rnd.nextInt(xs.length)
      val (l, r) = xs.splitAt(k)
      val whole = xs.foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      val split = WeightedMean.merge(
        l.foldLeft(WeightedMean.zero)(WeightedMean.reduce),
        r.foldLeft(WeightedMean.zero)(WeightedMean.reduce))
      assert(close(whole._1, split._1) && close(whole._2, split._2),
        s"split at $k diverged: $whole vs $split")
    }
  }

  test("WeightedMean: finish equals direct weighted mean") {
    for (_ <- 1 to 200) {
      val xs = randomPairs(1 + rnd.nextInt(50))
      val buf = xs.foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      val direct = xs.map { case (x, w) => x * w }.sum / xs.map(_._2).sum
      assert(close(WeightedMean.finish(buf), direct))
    }
  }

  test("WeightedMean: merge is commutative and zero is identity") {
    for (_ <- 1 to 200) {
      val a = randomPairs(1 + rnd.nextInt(20)).foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      val b = randomPairs(1 + rnd.nextInt(20)).foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      assert(WeightedMean.merge(a, b) == WeightedMean.merge(b, a))
      assert(WeightedMean.merge(a, WeightedMean.zero) == a)
    }
  }

  test("WeightedMean: empty buffer finishes to NaN, not a crash") {
    assert(WeightedMean.finish(WeightedMean.zero).isNaN)
  }
}
