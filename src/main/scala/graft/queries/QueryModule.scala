package graft.queries

import graft.Q

/** One SURVEY §2B operator family: its harness queries plus the DuckDB
  * oracle SQL for each SQL-expressible one (queries without an oracle get
  * the driver's weaker rows-only check + ScalaTest coverage instead).
  */
trait QueryModule {
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
