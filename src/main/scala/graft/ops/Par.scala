package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-bound per-row operators (MinHash/SimHash
  * signatures, cosine scoring): a small parquet fixture arrives as ONE
  * input split, so without intervention the whole hash/score pipeline
  * runs on a single core no matter how many the session has. [[spread]]
  * round-robins rows across the session's default parallelism first — a
  * trivially small shuffle at test scale. On a real cluster input splits
  * already outnumber cores, the guard condition fails, and the call is a
  * no-op (no shuffle inserted), so this never degrades the 100 TB plan.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    // If the plan already contains an exchange, leave it alone: (a) AQE
    // sizes post-shuffle parallelism itself, and (b) touching df.rdd here
    // would make AQE materialize every upstream shuffle stage eagerly just
    // to read a partition count — and the returned DataFrame would then
    // RECOMPUTE that work as a separate execution. The guard is only for
    // exchange-free scan pipelines, where df.rdd is pure planning (file
    // splits), no job runs, and nothing is recomputed.
    val hasExchange = df.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
    if (hasExchange) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }
}
