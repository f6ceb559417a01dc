package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization codebooks for the persisted ANN index (round-9
  * verdict item 4; Jégou et al., TPAMI 2011). The embedding space is
  * split into `m` subspaces of `d/m` dims; each subspace gets its own
  * K-centroid codebook, and every corpus vector stores only its M
  * nearest-centroid codes (M bytes vs 4·d for the floats — 32× for the
  * 64-dim fixture at M=8, vs SQ8's fixed 4×). Search scores probes with
  * the asymmetric-distance gather ([[graft.functions.PqAdc]]) over a
  * per-query lookup table and exact-reranks a shortlist from the float
  * column, so compression is invisible in the answer.
  *
  * Scale/determinism notes:
  *  - Codebooks are trained DRIVER-SIDE over a BOUNDED sample (first
  *    `sampleN` rows by `vec_id` — deterministic), the standard
  *    practice for PQ at scale (training needs thousands of points per
  *    centroid, not the corpus; FAISS trains on samples the same way).
  *    The collect is bounded by `sampleN`, never O(corpus).
  *  - Lloyd iterations run a fixed count with first-K-distinct init and
  *    empty-cluster carry-over — bit-deterministic for a fixed fixture,
  *    so the two-stage search can share the flat search's oracle.
  *  - Corpus vectors are L2-NORMALIZED before encoding and the LUT is
  *    built from the normalized query, so the ADC sum approximates
  *    cosine directly (dot of unit vectors).
  *  - K ≤ 127 keeps codes in non-negative signed-byte range.
  */
object Pq {

  /** Codebook sidecar inside the index version dir: one row per
    * (subspace, code) with its centroid — rides the atomic commit like
    * `_centroids` and is carried by linked commits.
    */
  val Sidecar = "_pq"

  /** Deterministic per-subspace Lloyd. `samples` are full-dim unit
    * vectors; returns books(m)(code) = centroid of subspace m.
    */
  private[graft] def train(samples: Array[Array[Double]], m: Int, k: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    require(samples.nonEmpty, "PQ training needs a non-empty sample")
    val d = samples.head.length
    require(d % m == 0, s"embedding dim $d not divisible by m=$m subspaces")
    require(k >= 1 && k <= 127, s"PQ codebook size must be in [1,127], got $k")
    val dsub = d / m
    Array.tabulate(m) { mi =>
      val subs = samples.map(v => java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub))
      // init: first k DISTINCT subvectors in sample order (repeat the
      // last when the sample has fewer distinct points than k)
      val distinct = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
      subs.iterator.takeWhile(_ => distinct.size < k).foreach { s =>
        if (seen.add(s.toSeq)) distinct += s
      }
      var cents = Array.tabulate(k)(i =>
        distinct(math.min(i, distinct.size - 1)).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Long](k)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var dist = 0.0; var j = 0
            while (j < dsub) { val t = s(j) - cents(c)(j); dist += t * t; j += 1 }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          var j = 0
          while (j < dsub) { sums(best)(j) += s(j); j += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0) cents(c) // empty cluster keeps its centroid
          else { val out = new Array[Double](dsub)
            var j = 0; while (j < dsub) { out(j) = sums(c)(j) / counts(c); j += 1 }; out })
        it += 1
      }
      cents
    }
  }

  /** L2-normalized double copy of an embedding column (null/zero-norm
    * rows yield null — unindexable, dropped by build callers).
    */
  private[graft] def unit(v: Column): Column = {
    val d = graft.functions.Vec.asDouble(v)
    val n = graft.functions.Vec.norm(v)
    when(n === 0.0 || n.isNull, lit(null).cast("array<double>"))
      .otherwise(transform(d, x => x / n))
  }

  private def booksCol(books: Array[Array[Array[Double]]]): Column =
    typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)

  /** Column of M byte codes for a unit vector under `books` — HOF
    * composition (argmin by `array_position(d, array_min(d))`, 1-based,
    * first-match deterministic tie-break). Build-time only: the search
    * hot path never encodes, it gathers ([[graft.functions.PqAdc]]).
    */
  private[graft] def encodeCol(unitVec: Column,
      books: Array[Array[Array[Double]]]): Column = {
    val m = books.length
    val dsub = books.head.head.length
    val bc = booksCol(books)
    transform(sequence(lit(0), lit(m - 1)), mi => {
      val sub = slice(unitVec, mi * dsub + 1, lit(dsub))
      val dists = transform(element_at(bc, (mi + 1).cast("int")), cent =>
        aggregate(zip_with(sub, cent, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x))
      (array_position(dists, array_min(dists)) - 1).cast("byte")
    })
  }

  /** Flattened M·K lookup table for a unit QUERY vector: lut[m·K+c] =
    * dot(query subvector m, books(m)(c)). Per-query-row cost — the
    * query side is broadcast-small by contract.
    */
  private[graft] def lutCol(unitQ: Column,
      books: Array[Array[Array[Double]]]): Column = {
    val m = books.length
    val dsub = books.head.head.length
    val bc = booksCol(books)
    flatten(transform(sequence(lit(0), lit(m - 1)), mi =>
      transform(element_at(bc, (mi + 1).cast("int")), cent =>
        aggregate(zip_with(slice(unitQ, mi * dsub + 1, lit(dsub)), cent,
          (x, y) => x * y), lit(0.0), (acc, x) => acc + x))))
  }

  /** Codebooks as a persistable frame: (m, code, centroid). */
  private[graft] def toFrame(spark: SparkSession,
      books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, mi) =>
      book.zipWithIndex.map { case (cent, c) => (mi, c, cent.toSeq) }
    }.toSeq.toDF("m", "code", "centroid")
  }

  /** Rebuild the nested codebook array from the sidecar frame
    * (driver-side collect of an M·K-row table — metadata-scale).
    */
  private[graft] def fromFrame(df: DataFrame): Array[Array[Array[Double]]] = {
    val rows = df.select("m", "code", "centroid").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    val out = Array.ofDim[Array[Double]](m, k)
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) =
      r.getSeq[Double](2).toArray)
    require(out.forall(_.forall(_ != null)), "incomplete PQ codebook sidecar")
    out
  }
}
