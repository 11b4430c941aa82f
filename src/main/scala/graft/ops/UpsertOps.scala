package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the batch pattern behind the
  * reference's append-then-dashboard flow (daily scrape appends, dashboards
  * aggregate, SURVEY.md §3.1): instead of recomputing rollups over 100 TB of
  * history each day, combine yesterday's aggregate state with today's delta.
  * Works because count/sum partials are associative-commutative monoids —
  * the same contract Spark's own partial aggregation relies on.
  */
object UpsertOps {

  /** Merge an existing (key → cnt, sum) aggregate table with the same
    * aggregation over a new delta: union of partials, one combine shuffle on
    * the key — cost proportional to |delta| + |distinct keys|, not history.
    */
  def mergeCountSum(existing: DataFrame, delta: DataFrame,
      keys: Seq[String], cntCol: String, sumCol: String): DataFrame =
    existing.select((keys.map(col) :+ col(cntCol) :+ col(sumCol)): _*)
      .unionByName(delta.select((keys.map(col) :+ col(cntCol) :+ col(sumCol)): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol), sum(col(sumCol)).as(sumCol))

  /** The upsert half (reference's probe+insert, database.py:106-158): new
    * facts keyed on business key replace existing rows, everything else
    * carries over — SQL MERGE semantics done with union + window dedup.
    * The dedup window's order is made TOTAL with a content-hash tiebreak:
    * (version, source) alone is not a total order, so two same-key
    * same-version rows with different payloads would survive
    * nondeterministically across runs/partitionings (r10 review). */
  def upsertLatest(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String], versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = existing.withColumn("__src", lit(0))
    val in = incoming.withColumn("__src", lit(1))
    val unioned = ex.unionByName(in)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc,
        xxhash64(existing.columns.map(col): _*).desc)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}
