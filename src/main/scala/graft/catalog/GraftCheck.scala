package graft.catalog

import graft.ops.{Expect, Sinks, TableProps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** SQL CHECK constraints for [[GraftCatalog]] tables, spelled as table
  * properties (the Delta convention):
  *
  * {{{
  *   ALTER TABLE graft.t SET TBLPROPERTIES ('check.nonneg' = 'value >= 0')
  *   ALTER TABLE graft.t UNSET TBLPROPERTIES ('check.nonneg')
  * }}}
  *
  * Constraints persist in a `_PROPS` sidecar at the table root (a
  * reserved layout name, so it can never collide with a table and moves
  * or dies with the table's directory on RENAME/DROP). Setting a
  * constraint validates the CURRENT contents first (one scan — the same
  * contract as Delta's ADD CONSTRAINT), so enforcement thereafter may
  * check whole statement results without ever failing on pre-existing
  * rows. Enforcement is [[Expect.enforce]]: row-local, codegen'd, rides
  * the statement's own scan — violating statements fail atomically
  * (nothing publishes) with the rule name and offending row.
  */
private[graft] object GraftCheck {
  val Prefix = "check."

  /** All stored table properties (constraints AND the partition spec) —
    * storage lives in [[graft.ops.TableProps]]; this module owns only
    * the `check.*` semantics. Concurrent-ALTER safety: `update` runs
    * load-validate-store as one serialized step under the table's commit
    * lock. A writer whose statement is already in flight when a
    * constraint lands was gated by the rules it read at execution time;
    * that window is the documented limit of data-only OCC (closing it
    * needs metadata-transaction conflict detection à la Delta's
    * protocol).
    */
  def load(root: String): Map[String, String] = TableProps.load(root)

  def update(root: String)(f: Map[String, String] => Map[String, String]): Unit =
    TableProps.update(root)(f)

  def store(root: String, props: Map[String, String]): Unit =
    TableProps.update(root)(old =>
      // replace the constraint family only — never clobber layout
      // properties (the partition spec) stored alongside
      old.filterNot(_._1.startsWith(Prefix)) ++ props)

  /** SQL CHECK semantics: a constraint whose expression evaluates to
    * UNKNOWN (NULL) is SATISFIED — unlike [[Expect]]'s
    * null-is-violation default, which is right for data-quality gates
    * but would make every null-backfilled column (partial-column
    * INSERT, ADD COLUMNS evolution — both documented contracts of this
    * layout) trip a `col > 0` constraint. Postgres and Delta agree.
    */
  private def checkRule(name: String, expression: String): Expect.Rule =
    Expect.rule(name,
      org.apache.spark.sql.functions.coalesce(
        expr(expression).cast("boolean"),
        org.apache.spark.sql.functions.lit(true)))

  /** The table's constraints as expectation rules, name-sorted for
    * deterministic violation messages.
    */
  def rules(root: String): Seq[Expect.Rule] =
    load(root).toSeq.collect {
      case (k, v) if k.startsWith(Prefix) => checkRule(k.stripPrefix(Prefix), v)
    }.sortBy(_.name)

  /** Gate `df` on the table's constraints; identity when none are set. */
  def enforce(df: DataFrame, root: String): DataFrame = {
    val r = rules(root)
    if (r.isEmpty) df else Expect.enforce(df, r)
  }

  /** Validate a new constraint: the expression must parse and resolve
    * to a boolean against the current schema, and every EXISTING row
    * must satisfy it (otherwise enforcement on later statements would
    * blame them for old data). One scan, at ALTER time.
    */
  def validateNew(spark: SparkSession, root: String, name: String,
      expression: String): Unit = {
    val cur = Sinks.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    validateAgainst(Sinks.readVersion(spark, root, cur), name, expression)
  }

  /** As [[validateNew]] over an explicit frame — lets CREATE TABLE
    * validate its declared constraints against an in-memory empty frame
    * BEFORE anything is published (a failed CREATE must leave no table
    * behind).
    */
  def validateAgainst(df: DataFrame, name: String, expression: String): Unit = {
    require(name.nonEmpty, "empty constraint name")
    val rule =
      try checkRule(name, expression)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"constraint $name: cannot parse '$expression': ${e.getMessage}") }
    // resolve + type-check against the schema before scanning
    try df.select(rule.good.cast("boolean")).queryExecution.analyzed
    catch { case e: Exception => throw new IllegalArgumentException(
      s"constraint $name: '$expression' does not resolve against " +
        s"schema ${df.schema.simpleString}: ${e.getMessage}") }
    // an empty table sums to NULL, which is zero violations
    val vRow = Expect.stats(df, Seq(rule)).select("n_violations").head()
    val violations = if (vRow.isNullAt(0)) 0L else vRow.getLong(0)
    require(violations == 0L,
      s"constraint $name: $violations existing row(s) violate '$expression' — " +
        "clean the data before adding the constraint")
  }
}
