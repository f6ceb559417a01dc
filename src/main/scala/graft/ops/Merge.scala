package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-INTO-shaped keyed upsert: apply a CDC delta (full-row
  * upsert/delete ops) to a base table — the daily "apply the change feed
  * to the corpus table" step every training-data pipeline ships.
  *
  * Scale shape: ONE shuffle — a full-outer equi-join on the key — then a
  * row-local resolve; no window, no collect, no driver state. AQE handles
  * key skew the same way it does for any shuffle join, and when the delta
  * is small relative to the base the optimizer broadcast-plans the delta
  * side exactly as MERGE implementations in lakehouse table formats do
  * their source-side lookup.
  */
object Merge {

  /** Collapse a multi-row CDC stream to the latest op per key: max_by over
    * an `orderCols` struct — the same partial-aggregating one-row-per-key
    * shuffle as SCD1 (never a whole-partition window sort).
    */
  def latestPerKey(cdc: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = cdc.columns.filterNot(keys.contains).toSeq
    cdc.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(orderCols.map(col): _*)).as("last"))
      .select(keys.map(col) ++ payload.map(c => col(s"last.$c").as(c)): _*)
  }

  /** Apply `delta` to `base`. `delta` must carry every non-key column of
    * `base` (full-row CDC, no partial updates) plus `opCol` with values
    * 'upsert' (insert if the key is absent, replace if present) or
    * 'delete' (drop the key; deleting an absent key is a no-op), and at
    * most one row per key (pre-collapse with [[latestPerKey]]).
    *
    * Schema evolution: a delta column ABSENT from the base becomes a new
    * nullable column of the result — pre-existing base rows are
    * back-filled null, exactly the additive-column CDC wrinkle every
    * production MERGE eventually meets. (Dropping a base column is NOT
    * evolution and still fails loudly; a retyped column goes through
    * Spark's usual when/otherwise coercion and fails analysis when the
    * types are incompatible.)
    */
  def upsert(base: DataFrame, delta: DataFrame,
      keys: Seq[String], opCol: String = "op"): DataFrame =
    resultOf(resolveJoin(base, delta, keys, opCol), keys)

  /** The merged table from a resolved flat join. */
  private def resultOf(rj: (DataFrame, Seq[String]), keys: Seq[String]): DataFrame = {
    val (flat, payload) = rj
    val op = col("_op")
    flat.filter(op.isNull || op =!= "delete")
      .select(keys.map(col) ++
        payload.map(c => when(op.isNotNull, col(s"_d_$c"))
          .otherwise(col(s"_b_$c")).as(c)): _*)
  }

  /** The same full-outer resolve as [[upsert]], shared with
    * [[upsertChanges]] so the MERGE result and its change feed are two
    * projections of ONE join shape (never two divergent classifications).
    * Returns a FLAT disambiguated frame — `keys ++ _b_present ++ _op ++
    * _b_<c>/_d_<c>` — so it can also be materialized once
    * (a durable [[Pin.stable]]) and both outputs derived from the identical
    * rows (see [[applyTo]] with `emitChanges`); alias-qualified columns
    * would not survive a checkpoint. `d`-presence is `_op`'s
    * non-nullness.
    */
  private def resolveJoin(base: DataFrame, delta: DataFrame,
      keys: Seq[String], opCol: String): (DataFrame, Seq[String]) = {
    require(!base.columns.contains(opCol),
      s"base must not contain the op column '$opCol' (rename one of them)")
    require(!base.columns.contains("_b_present") && !delta.columns.contains("_b_present"),
      "_b_present is reserved by Merge")
    val missing = base.columns.filterNot(keys.contains).filterNot(delta.columns.contains) ++
      (if (delta.columns.contains(opCol)) Nil else Seq(opCol))
    require(missing.isEmpty, s"delta is missing columns: ${missing.mkString(", ")}")
    // additive evolution: null-typed placeholders on the base side so the
    // resolve below is uniform across old and new columns
    val newCols = delta.columns
      .filterNot(c => keys.contains(c) || c == opCol || base.columns.contains(c)).toSeq
    val widened = newCols.foldLeft(base)((b, c) =>
      b.withColumn(c, lit(null).cast(delta.schema(c).dataType)))
    val payload = widened.columns.filterNot(keys.contains).toSeq
    // Fail loudly on a malformed feed: any op outside {upsert, delete}
    // (typos, wrong case, null) must abort the merge, not be silently
    // applied as an upsert. Checked on the delta BEFORE the join — after
    // the full outer join a null op legitimately marks base-only rows.
    val checked = delta.withColumn(opCol,
      when(col(opCol).isin("upsert", "delete"), col(opCol))
        .otherwise(raise_error(concat(
          lit(s"Merge.upsert: invalid $opCol value '"),
          coalesce(col(opCol).cast("string"), lit("null")),
          lit("' (expected 'upsert' or 'delete')")))))
    val joined = widened.withColumn("_b_present", lit(true)).as("b")
      .join(checked.as("d"), keys, "full_outer")
    val flat = joined.select(
      keys.map(col) ++
        Seq(col("b._b_present").as("_b_present"), col(s"d.$opCol").as("_op")) ++
        payload.map(c => col(s"b.$c").as(s"_b_$c")) ++
        payload.map(c => col(s"d.$c").as(s"_d_$c")): _*)
    (flat, payload)
  }

  /** The row-level change feed this merge produces — exactly what
    * [[Sinks.changesBetween]] would classify between the pre- and
    * post-merge versions, but derived from the merge's OWN join at write
    * time (insert / delete / update_preimage / update_postimage;
    * unchanged upserts and deletes of absent keys emit nothing). Persist
    * it with the commit ([[applyTo]] with `emitChanges`) and downstream
    * readers get an O(changed rows) feed without ever re-diffing two
    * table snapshots.
    */
  def upsertChanges(base: DataFrame, delta: DataFrame,
      keys: Seq[String], opCol: String = "op"): DataFrame =
    changesOf(resolveJoin(base, delta, keys, opCol), keys)

  /** The change feed from a resolved flat join. */
  private def changesOf(rj: (DataFrame, Seq[String]), keys: Seq[String]): DataFrame = {
    val (flat, payload) = rj
    val op = col("_op")
    val bPresent = col("_b_present").isNotNull
    val pre = struct(payload.map(c => col(s"_b_$c").as(c)): _*)
    val post = struct(payload.map(c => col(s"_d_$c").as(c)): _*)
    val rows =
      when(op === "upsert" && !bPresent,
        array(struct(lit("insert").as("t"), post.as("p"))))
      .when(op === "delete" && bPresent,
        array(struct(lit("delete").as("t"), pre.as("p"))))
      .when(op === "upsert" && bPresent && !(pre <=> post),
        array(struct(lit("update_preimage").as("t"), pre.as("p")),
          struct(lit("update_postimage").as("t"), post.as("p"))))
      .otherwise(slice(array(struct(lit("x").as("t"), pre.as("p"))), 1, 0))
    flat.select(keys.map(col) :+ explode(rows).as("_c"): _*)
      .select(keys.map(col) ++
        payload.map(p => col(s"_c.p.$p").as(p)) :+
        col("_c.t").as("_change_type"): _*)
  }

  /** Transactional upsert into a stored versioned table
    * ([[Sinks]] layout): pin the live version ONCE, read exactly that
    * version, merge, and publish conditioned on that same version — so a
    * concurrent publish between the read and the commit surfaces as a
    * `ConcurrentModificationException` (recompute and retry) rather than
    * a silent lost update. Re-applying the same delta is a no-op on the
    * data (a new version with identical rows), so a retried batch cannot
    * corrupt the table. Returns the published version.
    */
  def applyTo(spark: SparkSession, root: String, delta: DataFrame,
      keys: Seq[String], opCol: String = "op"): Long =
    applyTo(spark, root, delta, keys, opCol, emitChanges = false)

  /** `statsCols` carries file-level data skipping ([[Stats]]) through the
    * merge: without it every MERGE would publish a stats-less version and
    * silently demote the table to full scans (the same guarantee
    * compaction gives).
    */
  def applyTo(spark: SparkSession, root: String, delta: DataFrame,
      keys: Seq[String], opCol: String, emitChanges: Boolean,
      statsCols: Seq[String]): Long =
    applyToImpl(spark, root, delta, keys, opCol, emitChanges, statsCols)

  /** As [[applyTo]], with an expectations gate over the delta: rows
    * violating any rule are quarantined into the new version's
    * `_quarantine` sidecar ([[Sinks.readQuarantine]]) in the same atomic
    * commit as the merged data.
    */
  def applyTo(spark: SparkSession, root: String, delta: DataFrame,
      keys: Seq[String], opCol: String, emitChanges: Boolean,
      statsCols: Seq[String], rules: Seq[Expect.Rule]): Long =
    applyToImpl(spark, root, delta, keys, opCol, emitChanges, statsCols, rules)

  /** As [[applyTo]]; with `emitChanges` the merge also persists its
    * row-level change feed ([[upsertChanges]]) into the new version's
    * `_changes` sidecar — committed atomically with the data, making the
    * version readable through [[Sinks.changeFeed]]'s O(delta) fast path.
    *
    * The resolved join is materialized ONCE (durable [[Pin.stable]]) and both
    * the merged table and the feed project from those identical rows —
    * never two executions of the join, so (a) the merge's dominant
    * shuffle is not paid twice and (b) a non-deterministic delta (tied
    * `max_by` collapses, sampled sources) cannot make the committed feed
    * disagree with the committed data.
    */
  def applyTo(spark: SparkSession, root: String, delta: DataFrame,
      keys: Seq[String], opCol: String, emitChanges: Boolean): Long =
    applyToImpl(spark, root, delta, keys, opCol, emitChanges, Nil)

  private def applyToImpl(spark: SparkSession, root: String, delta: DataFrame,
      keys: Seq[String], opCol: String, emitChanges: Boolean,
      statsCols: Seq[String], rules: Seq[Expect.Rule] = Nil): Long = {
    val baseVersion = Sinks.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    // through the read funnel, not a raw parquet read: the base may
    // carry a deletion vector or a column mapping, and the merge must
    // see the subtracted rows under their logical names
    val base = Sinks.readVersion(spark, root, baseVersion)
    // Expectations gate the DELTA (the rows this merge would apply):
    // violating delta rows are quarantined into the new version's
    // sidecar instead of touching the table, and both land in the SAME
    // atomic commit — a crash can never apply unvetted rows or lose the
    // rejects. The delta is O(changes), so the pin is cheap.
    val (cleanDelta, quarantine) =
      if (rules.isEmpty) (delta, None)
      else {
        val (clean, quar) = Expect.splitPinned(delta, rules)
        (clean, Some(quar))
      }
    if (!emitChanges)
      Sinks.publishVersioned(upsert(base, cleanDelta, keys, opCol), root,
        Some(baseVersion), statsCols, changeFeed = None, quarantine = quarantine)
    else {
      // Pin.stable, not localCheckpoint: the resolved join is O(table),
      // and localCheckpoint blocks are non-replicated executor state —
      // at 100 TB one executor loss would kill the merge job. The
      // durable pin re-reads instead (round-9 verdict, B93).
      val (flat, payload) = resolveJoin(base, cleanDelta, keys, opCol)
      val pinned = (Pin.stable(flat), payload)
      Sinks.publishVersioned(resultOf(pinned, keys), root, Some(baseVersion),
        statsCols, changeFeed = Some(changesOf(pinned, keys)), quarantine = quarantine)
    }
  }
}
