package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics derived from the relational core: the edge list is built
  * with ordinary (shuffle-once) joins at fact scale, then the ITERATION runs
  * on the aggregated graph — nodes/edges, not rows. Connected components
  * (dedup_clusters) already covers the O(log n) doubling family; PageRank
  * adds the fixed-iteration mass-propagation family (one keyed agg + one
  * broadcast join per round, the MLlib/GraphX shape).
  */
object GraphQueries {
  import Tables._

  /** Damping/teleport written as independent literals, NOT computed from
    * each other: Scala's `1 - 0.85` is 0.15000000000000002 while both
    * engines' literal `0.15` is the nearest double to 0.15 — the constants
    * must enter both plans through the same decimal string. */
  private val Damping = 0.85
  private val Teleport = 0.15
  private val Rounds = 3

  /** The nation-level trade graph: edge src→dst weighted by how many
    * lineitems a customer of nation `src` bought from a supplier of nation
    * `dst`. Fact-scale joins happen ONCE (dims broadcast onto the fact);
    * everything iterative downstream touches only the ≤ N² aggregate. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** `graph_pagerank`: weighted PageRank over the trade graph, `Rounds`
    * synchronous iterations. Per round: per-edge contribution
    * rank·w/out_w, ONE keyed agg onto dst, damping applied, and the new
    * rank vector rounded to 6 dp — the proven cross-engine float recipe
    * (sum-order noise ~1e-16 ≪ the 1e-6 grid), so a scripted DuckDB
    * WITH-chain replays all rounds to the same hash. localCheckpoint per
    * round truncates the iterative lineage (the dedup_clusters pattern);
    * at real scale ranks live partitioned by node and the edge join
    * shuffles once per round — O(E) per iteration, never O(E²). */
  private def pagerank(s: SparkSession, d: String): DataFrame = {
    val edges = tradeEdges(s, d).localCheckpoint()
    val outW = edges.groupBy("src").agg(sum("w").as("out_w"))
    // contribution structure is rank-independent: fraction = w / out_w
    val frac = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("out_w")).as("f"))
      .localCheckpoint()
    val nodes = frac.select(col("src").as("node")).unionAll(
      frac.select(col("dst"))).distinct().localCheckpoint()
    val n = nodes.count()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("r"))
    for (_ <- 1 to Rounds) {
      val contrib = frac.join(ranks, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("f") * col("r")).as("mass"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(Teleport) / n +
            lit(Damping) * coalesce(col("mass"), lit(0.0)), 6).as("r"))
        .localCheckpoint()
    }
    ranks.join(nation(s, d), col("node") === col("n_nationkey"))
      .select(col("n_name"), col("r").as("rank"))
      .orderBy(col("rank").desc, col("n_name"))
  }

  private val pagerankSql = {
    val iter = (i: Int) =>
      s"""r$i AS (
         |  SELECT n.node,
         |         round(CAST($Teleport AS DOUBLE) / (SELECT count(*) FROM nodes)
         |           + CAST($Damping AS DOUBLE) * coalesce(m.mass, CAST(0.0 AS DOUBLE)), 6) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT f.dst AS node, SUM(f.f * p.r) AS mass
         |    FROM frac f JOIN r${i - 1} p ON f.src = p.node
         |    GROUP BY f.dst) m ON m.node = n.node)""".stripMargin
    s"""WITH edges AS (
       |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |frac AS (
       |  SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / ow.out_w AS f
       |  FROM edges e JOIN (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src) ow
       |    ON e.src = ow.src),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM frac UNION ALL SELECT dst FROM frac)),
       |r0 AS (SELECT node,
       |         CAST(1.0 AS DOUBLE) / (SELECT count(*) FROM nodes) AS r
       |       FROM nodes),
       |${(1 to Rounds).map(iter).mkString(",\n")}
       |SELECT n.n_name, r$Rounds.r AS rank
       |FROM r$Rounds JOIN nation n ON r$Rounds.node = n.n_nationkey
       |ORDER BY rank DESC, n_name""".stripMargin
  }

  def all: Seq[(String, Q)] = Seq(
    "graph_pagerank" -> Q(pagerank, Some(pagerankSql)))
}
