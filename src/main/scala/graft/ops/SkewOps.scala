package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §4.3 / the 100 TB posture): a
  * two-phase salted aggregation — pre-aggregate on (key, salt) so a hot key's
  * rows spread over `salts` reducers, then combine partials per key. AQE's
  * skew-join splitting handles joins; this handles skewed groupBys whose
  * per-key state is large (collect_list-like or high-cardinality partials).
  */
object SkewOps {

  /** Salted sum+count aggregation over `sumCol`, emitted as
    * (`k`, `total`, `cnt`). Results are identical to a direct groupBy
    * (sum/count are associative-commutative). */
  def saltedSumCount(df: DataFrame, key: Column, salts: Int,
      sumCol: Column): DataFrame = {
    // salt = content hash of the whole row: deterministic under task retries
    // and re-partitioning (monotonically_increasing_id would re-deal salts on
    // every retry). Caveat: fully identical rows share a salt bucket; hot
    // keys whose rows carry distinct payloads — the case salting exists
    // for — still spread over all `salts` reducers.
    val salted = df
      .withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(salts)))
    val partial = salted
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(sumCol).as("s"), count(lit(1)).as("c"))
    partial
      .groupBy("k")
      .agg(sum(col("s")).as("total"), sum(col("c")).as("cnt"))
  }

  /** Salted inner equi join for a skewed LEFT key when NEITHER side fits a
    * broadcast: the left side spreads a hot key's rows over `salts` shuffle
    * partitions via a content-hash salt; the right side replicates each row
    * to every salt (cost |right|·salts — acceptable precisely because the
    * right side is the smaller, else broadcast/AQE-skew-split is the answer).
    * Joining on (key, salt) makes every pair meet EXACTLY ONCE, so the
    * result is row-identical to the unsalted join — which is what the
    * registered query's oracle checks. */
  def saltedJoin(left: DataFrame, leftKey: Column, right: DataFrame,
      rightKey: Column, salts: Int): DataFrame = {
    val l = left.withColumn("__salt_l",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)))
    val r = right.withColumn("__salt_r",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, leftKey === rightKey && col("__salt_l") === col("__salt_r"))
      .drop("__salt_l", "__salt_r")
  }
}
