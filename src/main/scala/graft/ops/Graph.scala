package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as pure DataFrame loops (the
  * connected-components companion lives in [[Dedup.connectedComponents]]).
  *
  * Scale shape per iteration: one equi-join (edges ⋈ ranks) + one
  * key-shuffle aggregation — the standard distributed PageRank profile.
  * `localCheckpoint` cuts lineage each round so plans stay flat; at
  * 100 TB the per-round barrier is a write to real storage instead.
  * No driver-side data access: the node count rides along as a 1-row
  * broadcast anchor.
  */
object Graph {

  /** PageRank over a directed edge list (`src`, `dst`).
    *
    * @param damping  contribution weight (classically 0.85)
    * @param teleport base mass (classically 0.15); passed explicitly
    *                 rather than computed as 1-damping so literal values
    *                 match an oracle's decimal literals bit-for-bit
    *
    * Nodes are those appearing as a source (for a symmetrized edge set
    * that is every node, and guarantees outdeg >= 1 — no dangling-mass
    * correction needed).
    */
  def pagerank(edges: DataFrame, iters: Int,
      damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    val nodes = edges.select(col("src").as("node")).distinct().localCheckpoint()
    val nAnchor = broadcast(nodes.agg(count(lit(1)).cast("double").as("n")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.crossJoin(nAnchor)
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    (1 to iters).foreach { _ =>
      val contrib = edges.join(deg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg(sum(col("rank") / col("outdeg")).as("c"))
        .withColumnRenamed("dst", "node")
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(nAnchor)
        .select(col("node"),
          (lit(teleport) / col("n") +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
