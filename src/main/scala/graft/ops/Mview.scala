package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized view over a [[Sinks]] versioned
  * table: a stored `GROUP BY dims` aggregate that a refresh advances by
  * applying the change-data-feed ([[Sinks.changesBetween]]) instead of
  * recomputing — O(changed rows) per refresh regardless of table size,
  * which is the entire point of a materialized view at 100 TB (the daily
  * delta is GBs; the table is not).
  *
  * Maintained aggregates are the self-maintainable ones: row count
  * (`n_rows`) plus `sum_<c>` for each requested column — feed rows apply
  * as signed contributions (+ for insert/update_postimage, − for
  * delete/update_preimage), groups whose count reaches zero drop out.
  * `avg = sum/n` is derivable at read time; min/max are NOT maintainable
  * under deletes without a recompute and are deliberately not offered.
  * Sums over integral/decimal columns refresh exactly; float sums drift
  * by reassociation like any incremental view maintenance.
  *
  * Refresh bookkeeping: a `_MV_BASE` sidecar at the MV root records
  * `<mvVersion>:<sourceVersion>` — which MV version reflects which source
  * version. The marker is verified against the MV's CURRENT version
  * before the incremental path is taken; a crash between publish and
  * marker write, a vacuumed source base, or any other mismatch falls back
  * to a full recompute (correct, just not incremental) — stale
  * bookkeeping can cost a recompute, never a wrong answer. The MV publish
  * itself rides the OCC commit protocol, so concurrent refreshes cannot
  * lose updates.
  */
object Mview {

  private val Marker = "_MV_BASE"

  /** The view definition applied as a full computation (also the refresh
    * fallback and the spec's ground truth): `GROUP BY dims` with `n_rows`
    * and, per sum column, `sum_<c>` plus `nn_<c>` (its non-null count).
    * The non-null count is what keeps SQL null semantics exact under
    * incremental maintenance: `sum` over zero non-null values is NULL,
    * not 0, and only a maintained count can tell those apart after
    * deletes (coalescing NULL partials to 0 would make the refreshed MV
    * diverge from this very recompute).
    */
  def full(df: DataFrame, dims: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "materialized view needs at least one group dimension")
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.flatMap(c => Seq(sum(col(c)).as(s"sum_$c"),
          count(col(c)).as(s"nn_$c"))): _*)
  }

  /** Materialize the view of `srcRoot`'s CURRENT version into `mvRoot`.
    * Returns the MV version published.
    */
  def create(spark: SparkSession, srcRoot: String, mvRoot: String,
      dims: Seq[String], sumCols: Seq[String]): Long = {
    val srcV = Sinks.currentVersion(srcRoot).getOrElse(
      throw new IllegalStateException(s"no published version under $srcRoot"))
    val mv = full(Sinks.readVersion(spark, srcRoot, srcV), dims, sumCols)
    val mvV = Sinks.publishVersioned(mv, mvRoot, Sinks.currentVersion(mvRoot))
    writeMarker(mvRoot, mvV, srcV)
    mvV
  }

  /** Advance the MV to the source's current version. `srcKeys` is the
    * SOURCE table's row identity (for the change feed); `dims`/`sumCols`
    * must repeat the definition used at [[create]]. Returns the MV
    * version now live (unchanged when already current).
    */
  def refresh(spark: SparkSession, srcRoot: String, mvRoot: String,
      srcKeys: Seq[String], dims: Seq[String], sumCols: Seq[String]): Long = {
    val srcV = Sinks.currentVersion(srcRoot).getOrElse(
      throw new IllegalStateException(s"no published version under $srcRoot"))
    val mvV = Sinks.currentVersion(mvRoot).getOrElse(
      throw new IllegalStateException(s"$mvRoot has no materialized view; create() first"))
    readMarker(mvRoot) match {
      case Some((`mvV`, baseV)) if baseV == srcV => mvV // already current
      case Some((`mvV`, baseV)) if Sinks.listVersions(srcRoot).contains(baseV) =>
        // prefer the writer-persisted O(delta) feed (Sinks.changeFeed);
        // per-step rows telescope under signed summation, so the bag of
        // step feeds and the net snapshot diff yield the same delta
        // aggregate. Fall back to the O(table) snapshot diff when any
        // step lacks a sidecar.
        val feed = Sinks.changeFeed(spark, srcRoot, baseV, srcV)
          .map(_.drop("_commit_version"))
          .getOrElse(Sinks.changesBetween(spark, srcRoot, baseV, srcV, srcKeys))
        val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L)
        val delta = feed.groupBy(dims.map(col): _*)
          .agg(sum(sign).as("d_n"),
            sumCols.flatMap(c => Seq(
              sum(sign * col(c)).as(s"d_sum_$c"),
              sum(sign * when(col(c).isNotNull, 1L).otherwise(0L)).as(s"d_nn_$c"))): _*)
        val merged = applyDelta(Sinks.readVersion(spark, mvRoot, mvV), delta, dims, sumCols)
        val newV = Sinks.publishVersioned(merged, mvRoot, Some(mvV))
        writeMarker(mvRoot, newV, srcV)
        newV
      case _ =>
        // marker missing/stale (crash window) or source base vacuumed:
        // the incremental path is unsound — recompute from scratch
        val mv = full(Sinks.readVersion(spark, srcRoot, srcV), dims, sumCols)
        val newV = Sinks.publishVersioned(mv, mvRoot, Some(mvV))
        writeMarker(mvRoot, newV, srcV)
        newV
    }
  }

  /** The stored partials merged with a signed delta. Null dims are a real
    * group for `groupBy`, so the merge joins null-safely (`<=>`) — a
    * plain using-columns join would silently duplicate the null group.
    */
  private def applyDelta(mv: DataFrame, delta: DataFrame,
      dims: Seq[String], sumCols: Seq[String]): DataFrame = {
    val m = mv.as("m")
    val d = delta.as("d")
    val cond: Column = dims.map(k => col(s"m.$k") <=> col(s"d.$k")).reduce(_ && _)
    m.join(d, cond, "full_outer")
      .select(
        dims.map(k => coalesce(col(s"m.$k"), col(s"d.$k")).as(k)) ++
          Seq((coalesce(col("m.n_rows"), lit(0L)) + coalesce(col("d.d_n"), lit(0L)))
            .as("n_rows")) ++
          sumCols.flatMap { c =>
            val nn = coalesce(col(s"m.nn_$c"), lit(0L)) + coalesce(col(s"d.d_nn_$c"), lit(0L))
            // zero non-null contributions ⇒ the sum is NULL (SQL sum
            // semantics), exactly what the full recompute would say
            Seq(when(nn === 0, lit(null))
                .otherwise(coalesce(col(s"m.sum_$c"), lit(0L)) +
                  coalesce(col(s"d.d_sum_$c"), lit(0L))).as(s"sum_$c"),
              nn.as(s"nn_$c"))
          }: _*)
      .filter(col("n_rows") > 0)
  }

  def readCurrent(spark: SparkSession, mvRoot: String): DataFrame =
    Sinks.readCurrent(spark, mvRoot)

  /** Which (mvVersion, sourceVersion) pair the marker records, if any. */
  def syncedVersions(mvRoot: String): Option[(Long, Long)] = readMarker(mvRoot)

  private def writeMarker(mvRoot: String, mvV: Long, srcV: Long): Unit = {
    val tmp = Paths.get(mvRoot, s"$Marker.tmp")
    Files.write(tmp, s"$mvV:$srcV".getBytes("UTF-8"))
    Files.move(tmp, Paths.get(mvRoot, Marker),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def readMarker(mvRoot: String): Option[(Long, Long)] = {
    val p = Paths.get(mvRoot, Marker)
    if (!Files.exists(p)) None
    else new String(Files.readAllBytes(p), "UTF-8").trim.split(":") match {
      case Array(a, b) => (a.toLongOption, b.toLongOption) match {
        case (Some(x), Some(y)) => Some((x, y))
        case _ => None
      }
      case _ => None
    }
  }
}
