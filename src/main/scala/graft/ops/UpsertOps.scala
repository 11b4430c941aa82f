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

  /** ONE row per key, winner by `orderCols` (descending-first caller-built
    * columns) — THE keyed-dedup primitive shared by [[upsertLatest]] and
    * both JdbcUpsertSink paths, so the "total order or nondeterministic
    * winner" fix lives in exactly one place (r10 review: three hand-rolled
    * copies had already diverged on the tiebreak direction). Callers must
    * pass a TOTAL order; append a content-hash column when the natural
    * order has ties. */
  def latestPerKey(df: DataFrame, keys: Seq[String],
      orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The upsert half (reference's probe+insert, database.py:106-158): new
    * facts keyed on business key replace existing rows, everything else
    * carries over — SQL MERGE semantics done with union + window dedup.
    * The dedup window's order is made TOTAL with a content-hash tiebreak:
    * (version, source) alone is not a total order, so two same-key
    * same-version rows with different payloads would survive
    * nondeterministically across runs/partitionings (r10 review). */
  def upsertLatest(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String], versionCol: String): DataFrame =
    latestPerKey(
      existing.withColumn("__src", lit(0))
        .unionByName(incoming.withColumn("__src", lit(1))),
      keys,
      Seq(col(versionCol).desc, col("__src").desc,
        xxhash64(existing.columns.map(col): _*).desc))
      .drop("__src")
}
