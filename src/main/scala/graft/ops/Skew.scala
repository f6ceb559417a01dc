package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §1.2 / builder north star: "salting for skew").
  *
  * At 100 TB a handful of hot keys (the `en` language bucket, a viral
  * user_id) overwhelm single reducers. Two standard rewrites, both pure
  * DataFrame (AQE's skew-join split handles the *join* case adaptively at
  * runtime; these are the declarative forms for when AQE can't see it —
  * aggregation skew, or joins under disabled/misestimated AQE):
  *
  *  - [[saltedAggregate]]: two-phase aggregation — phase 1 groups by
  *    (key, salt) spreading a hot key over `buckets` reducers, phase 2
  *    merges the partials by key. Requires algebraic aggregates; the
  *    caller supplies both phases.
  *  - [[saltedJoin]]: the big (skewed) side gets a random-ish salt; the
  *    small side is replicated across all salt values; the join key
  *    becomes (key, salt), splitting each hot key's rows over `buckets`
  *    tasks.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Spreads rows of one key across buckets, deterministically from row
    * CONTENT (hash of every column). A nondeterministic salt
    * (rand/monotonically_increasing_id) becomes a correctness bug on
    * stage retry: a recomputed map task can assign different salts than
    * the output some reducers already fetched, duplicating or dropping
    * rows (the SPARK-23207 class). Content-derived salt is stable across
    * retries.
    *
    * Degenerate case, and why it is tolerable: rows whose non-key
    * columns are determined by the key (worst case: a projection to the
    * key columns alone) all hash to ONE salt bucket, so the salt spreads
    * nothing. But for [[saltedAggregate]] those are exactly the rows
    * map-side partial aggregation collapses to one partial per (key,
    * salt) per map task BEFORE the shuffle — the hot key's reducer
    * receives at most #mapTasks partial rows with or without salting, so
    * the case where the salt degenerates is the case where it was not
    * needed. Salting earns its keep when per-key rows are distinct
    * (count-distinct inputs, collect buffers, join rows), and distinct
    * content is precisely what content-hash spreads. [[degenerateWarn]]
    * still flags the guaranteed-degenerate call shape loudly.
    */
  private def salt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(buckets.toLong))

  /** Loud (not silent) no-op detection: a df whose every column is a key
    * column cannot be spread by content salt.
    */
  private def degenerateWarn(df: DataFrame, keys: Seq[String], op: String): Unit =
    if (df.columns.toSet.subsetOf(keys.toSet))
      log.warn(s"$op: input columns ${df.columns.mkString("[", ",", "]")} are all " +
        "key columns, so the content-derived salt is constant per key and spreads " +
        "nothing; rely on map-side partial aggregation here, or keep a non-key " +
        "column in the input")

  /** Two-phase salted aggregation.
    *
    * @param phase1 aggregates computed per (key, salt) — e.g.
    *               `Seq(count(lit(1)).as("n"), sum($"v").as("s"))`
    * @param phase2 merge of the phase-1 partials by key — e.g.
    *               `Seq(sum($"n").as("n"), sum($"s").as("s"))`
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
      phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    degenerateWarn(df, keys, "saltedAggregate")
    val salted = df.withColumn(SaltCol, salt(df, buckets))
    val partial = salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(phase1.head, phase1.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }

  /** Salted inner equi-join: `big` is skewed on `key`; `small` is
    * replicated `buckets`× (only acceptable when small is genuinely
    * small — the same precondition as a broadcast).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame =
    saltedJoinMulti(big, small, Seq(key), buckets)

  /** [[saltedJoin]] on a compound key (e.g. a bigram's (w1, w2)). */
  def saltedJoinMulti(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    degenerateWarn(big, keys, "saltedJoin")
    val b = big.withColumn(SaltCol, salt(big, buckets))
    val s = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    b.join(s, keys :+ SaltCol).drop(SaltCol)
  }

  /** The salt column name, for plan assertions in specs. */
  private[graft] def saltColName: String = SaltCol
}
