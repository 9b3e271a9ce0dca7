package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the same
  * join-aggregate-per-round shape as
  * [[graft.llm.Dedup.connectedComponents]]: each round is one shuffle
  * keyed by node, lineage cut by localCheckpoint (a 10-round loop would
  * otherwise compound a 10-deep join plan), previous rounds' blocks
  * released eagerly.
  */
object Graph {

  /** Weighted PageRank. `edges` = (src, dst, weight); out-edge
    * probabilities are weight / out-strength. Dangling mass (rank sitting
    * on nodes with no out-edges) is redistributed uniformly each round —
    * the full stochastic fix, so Σrank = 1 at every iteration and the
    * ranks are a true probability distribution (downstream consumers
    * assume it). The per-round cost of the fix is one semi-join scalar
    * aggregate over |V| plus a broadcast of its 1-row result — nothing
    * node-quadratic. Ranks start uniform at 1/N; each round is
    * contribution-join + per-node sum + dangling/teleport mix. At corpus
    * scale every stage is keyed by node id; nothing materializes more
    * than |E| + |V| rows.
    */
  def pageRank(edges: DataFrame, iters: Int = 10,
               damping: Double = 0.85): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val outStrength = edges.groupBy("src").agg(sum(col("weight")).as("wout"))
    val norm = edges.join(outStrength, Seq("src"))
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("wout")).as("p"))
      .localCheckpoint()
    // nodes with no out-edges: their whole rank is dangling mass
    val dangling = nodes
      .join(norm.select(col("src").as("node")), Seq("node"), "left_anti")
      .localCheckpoint()

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to iters) {
      val dmass = ranks.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dmass"))
      val contrib = norm.join(ranks, norm("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("p")).as("in_mass"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dmass))
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
              col("__dmass") / lit(n))).as("rank"))
        .localCheckpoint()
      bridge.releaseLocalCheckpoint(ranks)
      ranks = next
    }
    bridge.releaseLocalCheckpoint(norm)
    bridge.releaseLocalCheckpoint(nodes)
    bridge.releaseLocalCheckpoint(dangling)
    ranks
  }
}
