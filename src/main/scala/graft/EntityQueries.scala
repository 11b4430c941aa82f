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

  /** Entity resolution over `(rec_id, name)` records: link within
    * 4-char-prefix blocks at levenshtein ≤ 2, cluster the link graph,
    * report each multi-record entity (cluster id = lowest member rec_id).
    *
    * The pairwise work runs on the DISTINCT-NAME DICTIONARY, not on
    * records. Real dirty data is dictionary-heavy — popular exact values
    * repeat millions of times — and record-level all-pairs blocking goes
    * quadratic in exactly those hot blocks (measured 29 s at sf0.1 where
    * 20 000 records share 64 names; 100 TB would never finish). Records
    * sharing a name are lev-0-linked by definition, so the record graph's
    * components are exactly the preimage of the name graph's components:
    * aggregate names once (the only record-scale shuffle, map-side
    * combined), pair + levenshtein-verify distinct names (bounded 3-arg
    * band, length prefilter), run CC on name ids, and weight clusters by
    * name multiplicity. A name's id is its minimum rec_id, so the CC
    * label is the cluster's global minimum rec_id — same canonical ids as
    * the record-level graph. Single-record names with no similarity edge
    * are the one shape with no record-level edge; they are dropped, and
    * multi-record edgeless names keep their (self-pair) cluster. */
  /** The distinct-name dictionary: one record-scale aggregation (map-side
    * combined), everything downstream is dictionary-sized. */
  def nameDict(records: DataFrame): DataFrame = records
    .withColumn("blk", substring(col("name"), 1, 4))
    .groupBy("blk", "name")
    .agg(count(lit(1)).as("cnt"), min("rec_id").as("name_id"))

  /** Block-scoped levenshtein-verified candidate edges between distinct
    * names (ids = each name's min rec_id). Exposed so PlanAuditSpec can
    * audit the pairing plan — the CC loop checkpoints eagerly, so this
    * subtree is invisible in the final query's plan. */
  def nameEdges(dict: DataFrame): DataFrame = {
    val x = dict.select(col("blk"), col("name").as("na"), col("name_id").as("doc_a"))
    val y = dict.select(col("blk"), col("name").as("nb"), col("name_id").as("doc_b"))
    x.join(y, "blk")
      .filter(col("doc_a") < col("doc_b") &&
        abs(length(col("na")) - length(col("nb"))) <= 2 &&
        levenshtein(col("na"), col("nb"), 2) >= 0)
      .select("doc_a", "doc_b")
  }

  def linkEntities(records: DataFrame): DataFrame = {
    val dict = nameDict(records)
    val cc = DedupOps.connectedComponents(nameEdges(dict))
      .withColumnRenamed("doc_id", "name_id")
    dict.join(cc, Seq("name_id"), "left")
      .filter(col("cluster_id").isNotNull || col("cnt") >= 2)
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("name_id")))
      .groupBy("cluster_id")
      .agg(sum("cnt").as("n_records"), min("name_id").as("canonical_rec"))
      .orderBy("cluster_id")
  }

  /** `record_linkage`: part names + a deterministic "typo" variant for
    * every third part (5th character dropped) are the dirty records. The
    * oracle replays the same name-level blocking + levenshtein + a
    * recursive-CTE closure, expanded back to records — provably equal to
    * the record-level answer (see recordLinkageSql's note) and, unlike the
    * r10 record-level oracle, feasible at sf1. */
  private def recordLinkage(s: SparkSession, d: String): DataFrame =
    linkEntities(dirtyRecords(s, d))

  /** Oracle at NAME level, like the plan it checks: the r10 record-level
    * oracle (all record pairs per block + levenshtein + record-level
    * recursive closure) was correct but quadratic in block size — the 8
    * adjective-prefix blocks hold ~33k records each at sf1, ~4.5e9
    * levenshtein pairs, and the sf1 gate sat on it for 25+ minutes before
    * being killed. Name-level CC expands to the identical record-level
    * answer: records sharing a name are lev-0 cliques inside one block
    * (blk is a function of name), so record components are exactly the
    * name components' record sets; cluster_id/canonical_rec = min rec_id
    * within the expanded set, n_records = its size. */
  private val recordLinkageSql =
    """WITH RECURSIVE recs AS (
      |  SELECT p_partkey * 2 AS rec_id, p_name AS name FROM part
      |  UNION ALL
      |  SELECT p_partkey * 2 + 1,
      |         substring(p_name, 1, 4) || substring(p_name, 6)
      |  FROM part WHERE p_partkey % 3 = 0),
      |names AS (SELECT name, substring(name, 1, 4) AS blk,
      |                 min(rec_id) AS nid, count(*) AS nrec
      |          FROM recs GROUP BY 1, 2),
      |pairs AS (
      |  SELECT x.nid AS na, y.nid AS nb
      |  FROM names x JOIN names y
      |    ON x.blk = y.blk AND x.nid < y.nid
      |  WHERE levenshtein(x.name, y.name) <= 2),
      |edges AS (
      |  -- self-edge only for names holding >= 2 records: the record-level
      |  -- graph has no edge at all for a unique un-paired name, and such
      |  -- records were absent from the r10 record-level oracle's output
      |  SELECT nid AS src, nid AS dst FROM names WHERE nrec >= 2
      |  UNION ALL SELECT na, nb FROM pairs
      |  UNION ALL SELECT nb, na FROM pairs),
      |reach(node, label) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
      |ncc AS (SELECT node AS nid, min(label) AS nlabel FROM reach GROUP BY node),
      |rcc AS (
      |  SELECT r.rec_id, n2.nlabel
      |  FROM recs r
      |  JOIN names n1 ON r.name = n1.name
      |  JOIN ncc n2 ON n1.nid = n2.nid),
      |cc AS (SELECT rec_id,
      |              min(rec_id) OVER (PARTITION BY nlabel) AS cluster_id
      |       FROM rcc)
      |SELECT cluster_id, count(*) AS n_records, min(rec_id) AS canonical_rec
      |FROM cc GROUP BY cluster_id
      |ORDER BY cluster_id""".stripMargin

  /** The dirty-record set both entity queries share. */
  private def dirtyRecords(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
    val base = p.select((col("p_partkey") * 2).as("rec_id"),
      col("p_name").as("name"))
    val variant = p.filter(col("p_partkey") % 3 === 0)
      .select((col("p_partkey") * 2 + 1).as("rec_id"),
        concat(substring(col("p_name"), 1, 4),
          substring(col("p_name"), 6, 1000000)).as("name"))
    base.unionAll(variant)
  }

  /** `text_jaro_winkler`: score-ranked fuzzy matching over the same blocked
    * name dictionary record_linkage links — the native `jaro_winkler`
    * codegen expression scored against DuckDB's OWN jaro_winkler_similarity,
    * so two independent implementations of the whole two-phase algorithm
    * (match window, transposition count, Winkler prefix boost) must agree
    * to 6 dp on every surviving pair. Thresholded on the ROUNDED score on
    * both sides, so the cut is engine-exact too. */
  private def jaroWinklerPairs(s: SparkSession, d: String): DataFrame = {
    val dict = nameDict(dirtyRecords(s, d)).select("blk", "name")
    val x = dict.select(col("blk"), col("name").as("na"))
    val y = dict.select(col("blk"), col("name").as("nb"))
    x.join(y, "blk")
      .filter(col("na") < col("nb"))
      .select(col("na"), col("nb"),
        round(graft.functions.JaroWinkler(col("na"), col("nb")), 6).as("jw"))
      .filter(col("jw") >= 0.85)
      .orderBy("na", "nb")
  }

  private val jaroWinklerPairsSql =
    """WITH recs AS (
      |  SELECT p_name AS name FROM part
      |  UNION ALL
      |  SELECT substring(p_name, 1, 4) || substring(p_name, 6)
      |  FROM part WHERE p_partkey % 3 = 0),
      |dict AS (SELECT DISTINCT substring(name, 1, 4) AS blk, name FROM recs),
      |pairs AS (
      |  SELECT x.name AS na, y.name AS nb,
      |         round(jaro_winkler_similarity(x.name, y.name), 6) AS jw
      |  FROM dict x JOIN dict y ON x.blk = y.blk AND x.name < y.name)
      |SELECT na, nb, jw FROM pairs WHERE jw >= 0.85 ORDER BY na, nb""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "record_linkage" -> Q(recordLinkage, Some(recordLinkageSql)),
    "text_jaro_winkler" -> Q(jaroWinklerPairs, Some(jaroWinklerPairsSql)))
}
