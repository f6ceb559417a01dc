package graft.ops

import org.apache.spark.sql.Column
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
}
