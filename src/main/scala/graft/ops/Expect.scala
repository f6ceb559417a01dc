package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the DLT/Great-Expectations
  * pattern): a rule set evaluated row-by-row in ONE codegen'd pass, with
  * three consumption shapes —
  *
  *  - [[annotate]]: every row, plus a `_violations` array naming the
  *    rules it fails (empty = clean);
  *  - [[split]]: (clean rows, quarantined rows) — the ingest gate that
  *    keeps bad records out of the corpus WITHOUT losing them (quarantine
  *    carries `_violations` for triage);
  *  - [[stats]]: per-rule violation counts from one conditional-aggregate
  *    scan — the monitoring time series a 100 TB ingest emits per batch.
  *
  * Rules are named boolean [[Column]]s that GOOD rows satisfy. A rule
  * that evaluates to NULL (e.g. a comparison over a null field) is a
  * violation unless it explicitly handles nulls — null is not evidence
  * of quality, and the asymmetry is pinned in ExpectSpec.
  *
  * Scale shape: all three forms are shuffle-free over the input scan
  * ([[stats]] ends in a single-row global aggregate); nothing is
  * collected, nothing is recomputed per rule — N rules ride one scan.
  */
object Expect {

  /** A named expectation: `good` must be true for a row to pass. */
  final case class Rule(name: String, good: Column)

  def rule(name: String, good: Column): Rule = Rule(name, good)

  private def failed(r: Rule): Column = !coalesce(r.good, lit(false))

  /** Every row with a `_violations: array<string>` of failed rule names. */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    require(!df.columns.contains("_violations"),
      "input already has a _violations column")
    df.withColumn("_violations",
      filter(array(rules.map(r => when(failed(r), r.name)): _*), _.isNotNull))
  }

  /** (clean, quarantine): clean rows have the original schema; quarantine
    * keeps `_violations` for triage. One rule set, one predicate shape,
    * two complementary filters — a row lands in exactly one side.
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val marked = annotate(df, rules)
    (marked.filter(size(col("_violations")) === 0).drop("_violations"),
      marked.filter(size(col("_violations")) > 0))
  }

  /** [[split]] with the annotated frame pinned (`localCheckpoint`) so a
    * non-deterministic input cannot route a row to both sides or
    * neither — the variant transactional writers use when clean and
    * quarantine must commit as complementary sets
    * ([[Sinks.publishGated]], [[Merge.applyTo]] with rules).
    */
  def splitPinned(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val marked = annotate(df, rules).localCheckpoint()
    (marked.filter(size(col("_violations")) === 0).drop("_violations"),
      marked.filter(size(col("_violations")) > 0))
  }

  /** Fail-fast gate (the expect-or-fail mode): the input passed through
    * unchanged, except that materializing any row that violates a rule
    * aborts the job with the rule name and the row's rendering. For
    * pipelines where bad input must stop the batch (a corrupt CDC feed,
    * a schema-drift canary) rather than be quarantined. Row-local and
    * shuffle-free, like [[annotate]].
    */
  def enforce(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    val marked = annotate(df, rules)
    marked.withColumn("_violations",
        when(size(col("_violations")) > 0,
          raise_error(concat(
            lit("expectation failed: "),
            concat_ws(",", col("_violations")),
            lit(" on row "),
            to_json(struct(df.columns.toIndexedSeq.map(col): _*)))))
          .otherwise(col("_violations")))
      .filter(size(col("_violations")) === 0) // unreachable rows; keeps the gate lazy
      .drop("_violations")
  }

  /** One row per rule: `(rule, n_checked, n_violations, violation_rate)`,
    * computed in a single scan (one conditional sum per rule inside one
    * global aggregate, then unpivoted from the 1-row result).
    */
  def stats(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    // internal agg columns are indexed, not name-derived: a rule named
    // "value.capped" must not turn into a column-path lookup
    val agg = df.agg(
      count(lit(1)).as("n_checked"),
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(failed(r), 1L).otherwise(0L)).as(s"_v$i") }: _*)
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"_v$i").as("n_violations")) }
    agg.select(col("n_checked"), explode(array(stacked: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("n_checked"),
        col("r.n_violations").as("n_violations"),
        round(col("r.n_violations") / col("n_checked"), 6).as("violation_rate"))
  }
}
