package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * parquet row-group min/max stats prune scans, but only if rows that
  * are close in FILTER space are close in FILE space. Sorting by one
  * column clusters that column only; interleaving the bits of two
  * columns (Z-order / Morton curve) gives both columns locality, so
  * predicates on either dimension skip most files. Usage:
  * `df.repartitionByRange(n, zorder2(a, b)).sortWithinPartitions(zorder2(a, b)).write...`
  *
  * Pure codegen'd bit arithmetic (shifts/masks/or) — no UDF, and the
  * identical expression chain runs in any SQL engine, which is what
  * makes q_zorder oracle-verifiable value-for-value.
  */
object Layout {

  /** Spreads the low 32 bits of `x` so bit i lands at position 2i —
    * the standard Morton spread via parallel-prefix shifts and masks.
    */
  private def spread(x: Column): Column = {
    val masks = Seq(
      (16, 0x0000FFFF0000FFFFL),
      (8,  0x00FF00FF00FF00FFL),
      (4,  0x0F0F0F0F0F0F0F0FL),
      (2,  0x3333333333333333L),
      (1,  0x5555555555555555L))
    masks.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (acc, (s, m)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
    }
  }

  /** 64-bit Z-value interleaving two unsigned 32-bit dimensions:
    * bit i of `a` → bit 2i, bit i of `b` → bit 2i+1.
    */
  def zorder2(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** N-dimensional Z-value: interleave `bits` low bits of each of k
    * normalized dimensions — z bit `j*k + i` is bit `j` of `cols(i)`,
    * so the top interleaved bits alternate across ALL dimensions and a
    * range partitioning on z bounds every dimension per file (the
    * OPTIMIZE ZORDER layout for k > 2). Built as a plain bitwise
    * expression tree (k·bits OR-terms — codegen'd, no UDF; layout jobs
    * run it once per compaction, not per query). Inputs must already
    * sit on the `bits`-bit grid ([[normalize]]); k·bits ≤ 63 keeps the
    * z-value in a signed long. [[zorder2]] remains the full-width
    * 32-bit two-dimension fast path.
    */
  def zorderN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"zorderN needs >= 2 dimensions, got ${cols.size}")
    require(bits >= 1 && cols.size * bits <= 63,
      s"k*bits must fit a signed long: k=${cols.size}, bits=$bits")
    val k = cols.size
    cols.zipWithIndex.map { case (c, i) =>
      (0 until bits).map { j =>
        shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * k + i)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Linear rescale of `c` from `[lo, hi]` onto the `bits`-bit integer
    * grid `[0, 2^bits-1]`, clamped. Interleaving RAW columns is a Z-order
    * trap: the dimension with more significant bits owns every top
    * interleaved bit, so range-partitioning degenerates to a single-column
    * sort and the other dimension prunes nothing (SkippingSpec caught
    * exactly this on (custkey, day)). Normalizing both dimensions onto the
    * same grid first — what production OPTIMIZE ZORDER implementations do
    * via range-bucket ids — makes the top bits alternate between
    * dimensions regardless of their native domains. `lo`/`hi` come from
    * one tiny min/max aggregate of the frame being laid out.
    */
  def normalize(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 32, s"bits must be in [1, 32], got $bits")
    val grid = lit((1L << bits) - 1)
    val span = (hi - lo).cast("double")
    val scaled = floor((c - lo).cast("double") * grid / greatest(span, lit(1.0)))
    least(grid, greatest(lit(0L), scaled.cast("long")))
  }

  /** Save `df` as a bucketed + bucket-sorted catalog table: both sides of
    * a repeated equi-join written this way join with NO shuffle exchange
    * (the scan itself reports the hash partitioning, so the planner
    * sort-merges in place — ScaleSpec plan-asserts it). The pre-shuffle
    * `repartition` on the bucket keys uses the same murmur3-pmod hash as
    * the bucket spec, so each task holds exactly one bucket and the table
    * lands as one file per bucket instead of tasks × buckets shards — at
    * 100 TB the difference between a clean layout and a small-file
    * explosion.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: String*): Unit = {
    require(keys.nonEmpty, "writeBucketed requires at least one bucket key")
    df.repartition(buckets, keys.map(col): _*)
      .write.format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite").saveAsTable(table)
  }
}
