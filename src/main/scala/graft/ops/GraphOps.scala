package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier-expansion graph traversal over an aggregated edge list — the
  * third iteration family next to PageRank (fixed-round mass propagation)
  * and the large/small-star connected components (doubling). Inputs are
  * node-level edges (the caller reduces fact data to the graph FIRST), so
  * each round is one join + one keyed min-agg over graph-sized data.
  */
object GraphOps {

  /** Single-source shortest hop counts via synchronous BFS, `maxHops`
    * rounds. Per round only the PREVIOUS frontier (rows at hops = h−1)
    * joins the edge list — not the whole distance table — and a keyed
    * min-agg folds newly reached nodes in; `localCheckpoint` truncates the
    * iterative lineage (the PageRank/CC pattern). Nodes not reached within
    * `maxHops` are absent from the result.
    *
    * @param edges directed edges with long columns `src`, `dst`
    * @return (`node` long, `hops` int) for every node within reach
    */
  def bfsHops(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
    val s = edges.sparkSession
    val adj = edges.select("src", "dst").filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint(false)
    var dist = s.range(1).select(lit(source).as("node"), lit(0).as("hops"))
    var h = 1
    var frontierAlive = true
    while (h <= maxHops && frontierAlive) {
      val next = dist.filter(col("hops") === h - 1)
        .join(adj, col("node") === col("src"))
        .select(col("dst").as("node"), lit(h).as("hops"))
      dist = dist.unionAll(next)
        .groupBy("node").agg(min("hops").as("hops"))
        .localCheckpoint(false)
      // early exit once the frontier dies: a diameter-3 graph asked for
      // maxHops = 30 should not pay 27 empty join+agg+checkpoint rounds.
      // The checkpoint above is LAZY (r14 sweep), so this count is the
      // materializing action; if its limit(1) stops short of computing
      // every partition, Spark's LocalRDDCheckpointData.doCheckpoint runs
      // a fill-in job over the missing partitions at job end, so the next
      // round always reads fully-cached blocks, never lineage.
      frontierAlive = dist.filter(col("hops") === h).limit(1).count() > 0
      h += 1
    }
    dist
  }
}
