package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental SCD2 maintenance — the APPLY-CHANGES-INTO pattern: a
  * dimension table holds validity intervals `(key, …payload,
  * valid_from, valid_to, is_current)` and each refresh applies a BATCH
  * of upserts instead of rebuilding history from all events ever seen.
  * B80 (q_scd2_intervals) constructs the history; this op maintains it.
  *
  * Contract (what makes incremental ≡ full-rebuild, which is exactly
  * what the oracle checks): every change in the batch is later than the
  * target's current rows for its key. Then
  *  - a key's current row closes at the key's FIRST change timestamp,
  *  - the batch's changes become intervals via `lead` within the key
  *    (several changes to one key in one batch each get their own
  *    interval — intermediate versions are history, not lost updates),
  *  - the last change per key becomes the new current row,
  *  - keys without changes pass through untouched.
  *
  * Scale shape: the change batch aggregates to one `(key, first_ts)`
  * row per touched key and joins the target on the key — the same
  * equi-shuffle the target's own key partitioning already wants (and a
  * broadcast when the touched-key set is small); interval assembly is
  * one window over the BATCH only. Nothing scans history except the
  * key join, and callers on the versioned tier commit the result
  * through MOR MERGE for O(touched) persistence.
  *
  * Deletes ride the upsert stream as tombstone payloads if the caller
  * wants them (filter `is_current` rows by the tombstone marker after
  * apply); hard row removal is MOR DELETE's job (B135), not SCD2's —
  * an SCD2 dimension's whole point is that nothing disappears.
  */
object Scd {

  /** Apply `changes` (rows shaped like the dimension's payload plus
    * `tsCol`/`tieCol`) to `target` (rows shaped `(keyCol, …,
    * valid_from, valid_to, is_current)`). Returns the new dimension
    * state with the target's column set.
    */
  def applyChanges(target: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val fresh = changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
    val firstTs = changes.groupBy(keyCol)
      .agg(min(col(tsCol)).as("__gf_close_ts"))
    val closed = target.join(firstTs, Seq(keyCol), "left")
      .withColumn("valid_to",
        when(col("is_current") && col("__gf_close_ts").isNotNull,
          col("__gf_close_ts")).otherwise(col("valid_to")))
      .withColumn("is_current",
        col("is_current") && col("__gf_close_ts").isNull)
      .drop("__gf_close_ts")
    closed.unionByName(fresh.select(closed.columns.map(col): _*))
  }
}
