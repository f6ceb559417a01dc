package object graft {
  /** A harness query: (session, sf-dir) => result DataFrame.
    * Matches the driver contract in [[graft.SparkEntry.queries]].
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
