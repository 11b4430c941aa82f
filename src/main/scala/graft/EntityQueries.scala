package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Entity resolution (record linkage): the blocking → pairwise-similarity →
  * transitive-closure pipeline that reconciles dirty duplicate records into
  * entities — composed entirely from proven parts (deterministic blocking
  * keys, the cross-engine `levenshtein`, and the large-star/small-star
  * connected components of dedup_clusters).
  *
  * Scale notes (100 TB): candidate pairs exist ONLY within a blocking key
  * (the ER-standard bound — O(Σ b_k²), never records²); the edit-distance
  * verify pays only on those candidates; clustering is the O(log n)
  * doubling CC. Everything shuffles on the block key exactly once.
  */
object EntityQueries {
  import Tables._

  /** `record_linkage`: part names + a deterministic "typo" variant for
    * every third part (5th character dropped) are the dirty records; link
    * within 4-char-prefix blocks at levenshtein ≤ 2, cluster the link
    * graph, report each multi-record entity with its canonical (lowest)
    * record id. The oracle replays blocking + levenshtein + a recursive-CTE
    * closure — linkage output is engine-exact. */
  private def recordLinkage(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
    val base = p.select((col("p_partkey") * 2).as("rec_id"),
      col("p_name").as("name"))
    val variant = p.filter(col("p_partkey") % 3 === 0)
      .select((col("p_partkey") * 2 + 1).as("rec_id"),
        concat(substring(col("p_name"), 1, 4),
          substring(col("p_name"), 6, 1000000)).as("name"))
    val recs = base.unionAll(variant)
      .withColumn("blk", substring(col("name"), 1, 4))
    val a = recs.select(col("blk"), col("rec_id").as("doc_a"), col("name").as("na"))
    val b = recs.select(col("blk"), col("rec_id").as("doc_b"), col("name").as("nb"))
    val pairs = a.join(b, "blk")
      .filter(col("doc_a") < col("doc_b") &&
        levenshtein(col("na"), col("nb")) <= 2)
      .select("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs)
    cc.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_records"), min("doc_id").as("canonical_rec"))
      .orderBy("cluster_id")
  }

  private val recordLinkageSql =
    """WITH RECURSIVE recs AS (
      |  SELECT p_partkey * 2 AS rec_id, p_name AS name FROM part
      |  UNION ALL
      |  SELECT p_partkey * 2 + 1,
      |         substring(p_name, 1, 4) || substring(p_name, 6)
      |  FROM part WHERE p_partkey % 3 = 0),
      |blocked AS (SELECT rec_id, name, substring(name, 1, 4) AS blk FROM recs),
      |pairs AS (
      |  SELECT x.rec_id AS doc_a, y.rec_id AS doc_b
      |  FROM blocked x JOIN blocked y
      |    ON x.blk = y.blk AND x.rec_id < y.rec_id
      |  WHERE levenshtein(x.name, y.name) <= 2),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(node, label) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
      |cc AS (SELECT node AS rec_id, min(label) AS cluster_id FROM reach GROUP BY node)
      |SELECT cluster_id, count(*) AS n_records, min(rec_id) AS canonical_rec
      |FROM cc GROUP BY cluster_id
      |ORDER BY cluster_id""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "record_linkage" -> Q(recordLinkage, Some(recordLinkageSql)))
}
