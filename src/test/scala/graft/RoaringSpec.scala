package graft

import graft.ops.Roaring
import org.scalatest.funsuite.AnyFunSuite

/** The deletion-vector bitmap codec ([[graft.ops.Roaring]]): round-trip,
  * container promotion at the array/bitset boundary, union semantics,
  * and size bounds (the whole point of the encoding).
  */
class RoaringSpec extends AnyFunSuite {

  test("round-trip: arbitrary positions, duplicates folded, sorted out") {
    val pos = Array(5L, 1L, 70000L, 5L, 65535L, 65536L, 0L, 1L << 40)
    val bytes = Roaring.fromPositions(pos)
    assert(Roaring.positions(bytes).toSeq ==
      pos.distinct.sorted.toSeq)
    assert(Roaring.cardinality(bytes) == pos.distinct.length)
  }

  test("empty bitmap") {
    val bytes = Roaring.fromPositions(Array.empty[Long])
    assert(Roaring.cardinality(bytes) == 0)
    assert(Roaring.positions(bytes).isEmpty)
  }

  test("array->bitset promotion at 4096 and dense containers stay 8KiB-bounded") {
    // 5000 entries in one 65536-container crosses the promotion line
    val pos = (0L until 5000L).map(_ * 13 % 65536).distinct.toArray
    val bytes = Roaring.fromPositions(pos)
    assert(Roaring.positions(bytes).toSeq == pos.sorted.toSeq)
    // a fully-dense container: 65536 positions, must serialize ~8KiB
    val dense = Roaring.fromPositions((0L until 65536L).toArray)
    assert(Roaring.cardinality(dense) == 65536)
    assert(dense.length < 9000, s"dense container blew up: ${dense.length} bytes")
    // the same set as v1-style (file,row_index) parquet rows would be
    // ~0.5MB; the bitmap is ~100x smaller — the encoding's reason to exist
  }

  test("union: disjoint, overlapping, array+bitset mixes") {
    val a = Roaring.fromPositions(Array(1L, 2L, 100000L))
    val b = Roaring.fromPositions(Array(2L, 3L, 200000L))
    assert(Roaring.positions(Roaring.union(a, b)).toSeq ==
      Seq(1L, 2L, 3L, 100000L, 200000L))
    // array ∪ array crossing the promotion threshold
    val lowHalf = Roaring.fromPositions((0L until 3000L).toArray)
    val highHalf = Roaring.fromPositions((2000L until 6000L).toArray)
    val u = Roaring.union(lowHalf, highHalf)
    assert(Roaring.cardinality(u) == 6000)
    assert(Roaring.positions(u).toSeq == (0L until 6000L).toSeq)
    // bitset ∪ array
    val dense = Roaring.fromPositions((0L until 30000L).map(_ * 2).toArray)
    val sparse = Roaring.fromPositions(Array(1L, 3L, 59999L))
    assert(Roaring.cardinality(Roaring.union(dense, sparse)) == 30003)
    // unionAll over many chunks == one build
    val chunks = (0 until 10).map(i =>
      Roaring.fromPositions((i * 100L until (i + 1) * 100L).toArray))
    val all = Roaring.unionAll(chunks.iterator)
    assert(Roaring.positions(all).toSeq == (0L until 1000L).toSeq)
  }

  test("sparse deltas stay tiny: 10 scattered rows in a billion-row space") {
    val pos = (0 until 10).map(i => i * 100000000L).toArray
    val bytes = Roaring.fromPositions(pos)
    assert(Roaring.positions(bytes).toSeq == pos.toSeq)
    assert(bytes.length < 400, s"sparse bitmap too large: ${bytes.length}")
  }

  test("property: round-trip, cardinality, union, and probe agree with a reference Set for arbitrary position sets") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    // positions clustered near container boundaries AND scattered wide —
    // the shapes that exercise array/bitset promotion and key splits
    val posGen: Gen[Long] = Gen.oneOf(
      Gen.choose(0L, 300L),                      // dense low container
      Gen.choose(65530L, 65545L),                // straddles a key boundary
      Gen.choose(0L, 1L << 40),                  // scattered wide
      Gen.choose(0L, 70000L))                    // promotion-range density
    val setGen: Gen[List[Long]] = Gen.listOf(posGen)
    val prop = forAll(setGen, setGen) { (a: List[Long], b: List[Long]) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val (ba, bb) = (Roaring.fromPositions(a.toArray), Roaring.fromPositions(b.toArray))
      val u = Roaring.union(ba, bb)
      val lk = new graft.ops.RoaringLookup(Array("f" -> u))
      val uf = org.apache.spark.unsafe.types.UTF8String.fromString("f")
      val su = sa ++ sb
      Prop.all(
        Prop(Roaring.positions(ba).toSeq == sa.toSeq.sorted) :| "round-trip",
        Prop(Roaring.cardinality(u) == su.size.toLong) :| "union cardinality",
        Prop(Roaring.positions(u).toSeq == su.toSeq.sorted) :| "union positions",
        Prop(su.forall(p => lk.contains(uf, p))) :| "probe hits",
        Prop(su.forall(p => !lk.contains(uf, p + 1) || su.contains(p + 1)))
          :| "probe misses neighbors")
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("lookup probe: membership matches positions exactly over array AND bitset containers") {
    import org.apache.spark.unsafe.types.UTF8String
    // file A: sparse array containers; file B: a dense promoted bitset
    val a = (0 until 100).map(i => i * 977L).toArray
    val b = (0L until 6000L).toArray // > 4096 → bitset container
    val lk = new graft.ops.RoaringLookup(Array(
      "A" -> Roaring.fromPositions(a), "B" -> Roaring.fromPositions(b)))
    val ua = UTF8String.fromString("A"); val ub = UTF8String.fromString("B")
    assert(a.forall(lk.contains(ua, _)))
    assert(b.forall(lk.contains(ub, _)))
    // misses: off-by-one neighbors, wrong file, unknown file, negatives
    assert(!a.exists(p => lk.contains(ua, p + 1) && !a.contains(p + 1)))
    assert(!lk.contains(ua, 6001L) || a.contains(6001L))
    assert(!lk.contains(ub, 6000L))
    assert(!lk.contains(UTF8String.fromString("C"), 0L))
    assert(!lk.contains(ua, -1L))
    assert(lk.contains(ub, 5999L) && !lk.contains(ub, 600000L))
  }
}
