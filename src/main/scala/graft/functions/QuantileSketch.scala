package graft.functions

/** Deterministic mergeable quantile sketch — a KLL-style compactor stack
  * with DETERMINISTIC (alternating-parity) compaction instead of coin
  * flips, so the same inputs always produce the same sketch and
  * property tests can pin behavior exactly.
  *
  * Structure: `levels(i)` holds items of weight 2^i; when a level
  * overflows `k` items it is sorted and every other item survives to
  * level i+1 (the survivor parity alternates per level across
  * compactions — the classic derandomization). Rank queries sum
  * weights over the sorted (value, weight) pairs.
  *
  * Why it exists (SURVEY B83/B84 family): `percentile` is exact but not
  * mergeable across shards without reshuffling raw values, and
  * `percentile_approx` is a black box the engine cannot persist or
  * union incrementally. This sketch is a value: serialize per shard /
  * per day, MERGE the sketches, query once — the same
  * accumulate/combine contract as the HLL and frequent-items rows, now
  * for quantiles. Size is O(k log(n/k)) regardless of n.
  *
  * Error: deterministic compaction loses at most 1 rank unit of weight
  * 2^i per compaction at level i; the spec pins observed rank error on
  * adversarial orders (sorted, reversed, interleaved) at well under 1%
  * of n for k=200.
  */
final case class QuantileSketch(k: Int, count: Long,
    levels: Seq[Seq[Double]], parities: Seq[Boolean]) {

  private def compactAt(ls: Vector[Vector[Double]], ps: Vector[Boolean], i: Int)
      : (Vector[Vector[Double]], Vector[Boolean]) = {
    val sorted = ls(i).sorted
    val keepOdd = ps(i)
    val survivors = sorted.indices.collect {
      case j if (j % 2 == 1) == keepOdd => sorted(j)
    }.toVector
    val grown = if (i + 1 < ls.size) ls else ls :+ Vector.empty[Double]
    val grownP = if (i + 1 < ps.size) ps else ps :+ false
    val next = grown
      .updated(i, Vector.empty[Double])
      .updated(i + 1, grown(i + 1) ++ survivors)
    (next, grownP.updated(i, !keepOdd))
  }

  private def normalized(ls: Vector[Vector[Double]], ps: Vector[Boolean])
      : QuantileSketch = {
    var (l, p) = (ls, ps)
    var i = 0
    while (i < l.size) {
      if (l(i).size > k) { val r = compactAt(l, p, i); l = r._1; p = r._2 }
      i += 1
    }
    QuantileSketch(k, count, l.map(_.toSeq), p.toSeq)
  }

  def add(v: Double): QuantileSketch = {
    // hot path: level 0 has room — append without touching the stack.
    // Compaction semantics are unchanged (it only ever fires when a
    // level EXCEEDS k, which this branch cannot cause), so the sketch
    // stays bit-identical to the always-normalize form; the branch just
    // skips the per-row full-stack scan that dominated aggregate cost.
    if (levels.nonEmpty && levels.head.size < k) {
      val l0 = (levels.head match {
        case vec: Vector[Double] => vec
        case s => s.toVector
      }) :+ v
      copy(count = count + 1, levels = levels.toVector.updated(0, l0))
    } else {
      val ls = levels.map(_.toVector).toVector
      val base = if (ls.isEmpty) Vector(Vector(v)) else ls.updated(0, ls(0) :+ v)
      val ps = if (parities.isEmpty) Vector(false) else parities.toVector
      copy(count = count + 1, levels = base.map(_.toSeq), parities = ps.toSeq)
        .normalizedSelf
    }
  }

  private def normalizedSelf: QuantileSketch =
    normalized(levels.map(_.toVector).toVector, parities.toVector)

  def merge(other: QuantileSketch): QuantileSketch = {
    require(k == other.k, s"cannot merge sketches with k=$k and k=${other.k}")
    val depth = math.max(levels.size, other.levels.size)
    val ls = Vector.tabulate(depth) { i =>
      (if (i < levels.size) levels(i).toVector else Vector.empty) ++
        (if (i < other.levels.size) other.levels(i).toVector else Vector.empty)
    }
    val ps = Vector.tabulate(depth) { i =>
      (i < parities.size && parities(i)) ^ (i < other.parities.size && other.parities(i))
    }
    QuantileSketch(k, count + other.count, Nil, Nil).normalizedWith(ls, ps)
  }

  private def normalizedWith(ls: Vector[Vector[Double]], ps: Vector[Boolean])
      : QuantileSketch = normalized(ls, ps)

  /** The value at rank quantile `q` in [0,1] (weighted lower quantile). */
  def quantile(q: Double): Double = quantiles(Seq(q)).head

  /** All requested quantile points from ONE flatten+sort of the sketch
    * (the per-group finish path answers every point against the same
    * sorted weighted list instead of rebuilding it per point).
    */
  def quantiles(qs: Seq[Double]): Seq[Double] = {
    qs.foreach(q => require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q"))
    val weighted = levels.zipWithIndex.flatMap { case (l, i) =>
      l.map(v => (v, 1L << i))
    }.sortBy(_._1)
    if (weighted.isEmpty) return qs.map(_ => Double.NaN)
    val total = weighted.map(_._2).sum
    qs.map { q =>
      val target = math.min((q * total).toLong, total - 1)
      var acc = 0L
      weighted.find { case (_, w) => acc += w; acc > target }.map(_._1)
        .getOrElse(weighted.last._1)
    }
  }
}

object QuantileSketch {
  def empty(k: Int = 200): QuantileSketch = {
    require(k >= 8, s"k must be >= 8, got $k")
    QuantileSketch(k, 0L, Nil, Nil)
  }

  /** Build from an iterator (per-shard accumulate). */
  def of(values: IterableOnce[Double], k: Int = 200): QuantileSketch =
    values.iterator.foldLeft(empty(k))(_.add(_))
}
