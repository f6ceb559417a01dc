package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe interval join: the naive `p >= lo AND p < hi` theta-join
  * is a nested-loop — fine when one side broadcasts (B22's shape),
  * quadratic death when BOTH sides are large (millions of IP ranges ×
  * billions of lookups, session intervals × events). The standard fix
  * every warehouse implements (and the published binned/bucketed
  * range-join optimization in Databricks/DuckDB): quantize the value
  * domain into fixed-width bins, explode each interval into the bins it
  * overlaps, map each point to its single bin, EQUI-join on the bin id,
  * and re-check the exact predicate on the survivors.
  *
  * Correctness is bin-width independent: the equi-join only proposes
  * candidates, the exact `[lo, hi)` filter decides — a sloppy width
  * costs shuffle rows, never rows of the answer. Each (interval, point)
  * pair meets in exactly the point's one bin, so no dedup step is
  * needed. Pick `binWidth` near the typical interval length: wider
  * costs false candidates per bin, narrower costs interval replication
  * (an interval lands in ~1 + len/binWidth bins).
  *
  * Scale shape: one equi-shuffle on the bin id (or a broadcast hash
  * join when the exploded interval side is small) — Catalyst sees an
  * ordinary equi-join with a residual predicate, so AQE, broadcast
  * promotion, and skew handling all apply. Degenerate empty intervals
  * (`lo >= hi`) are dropped up front (they can match nothing, and
  * Spark's `sequence` would count DOWN for them, exploding garbage
  * bins).
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose
    * `[loCol, hiCol)` contains `pointCol`. Column sets must be disjoint
    * (standard join hygiene — rename before calling).
    *
    * Open-ended sentinel intervals (the `hi = 1e9` idiom broadcast
    * theta-joins tolerate) are a TRAP here: one such interval explodes
    * `span / binWidth` bin rows. The per-interval bin count is guarded
    * by `maxBinsPerInterval` (a runtime `raise_error`, since bounds are
    * data) — cap sentinel bounds at the data's real maximum, or widen
    * `binWidth`, before binning.
    */
  def binnedPointJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(maxBinsPerInterval >= 1,
      s"maxBinsPerInterval must be >= 1, got $maxBinsPerInterval")
    val nBins = floor(col(hiCol) / binWidth).cast("long") -
      floor(col(loCol) / binWidth).cast("long") + 1L
    val ibin = intervals.filter(col(loCol) < col(hiCol))
      .withColumn("__gf_bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        when(nBins > maxBinsPerInterval, raise_error(concat(
            lit("binnedPointJoin: an interval spans "), nBins.cast("string"),
            lit(s" bins (> $maxBinsPerInterval) — an open-ended sentinel " +
              "bound? cap it at the data's max or widen binWidth"))))
          .otherwise(floor(col(hiCol) / binWidth).cast("long")))))
    val pbin = points.withColumn("__gf_pbin",
      floor(col(pointCol) / binWidth).cast("long"))
    pbin.join(ibin, col("__gf_pbin") === col("__gf_bin") &&
        col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__gf_pbin", "__gf_bin")
  }
}
