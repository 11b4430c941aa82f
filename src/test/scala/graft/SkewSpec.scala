package graft

import org.apache.spark.sql.functions._

/** Skew posture: AQE's runtime skew-join splitting plus the manual salting
  * fallback (SkewOps) — the two tools that keep hot keys from serializing a
  * 1000-executor job onto one reducer. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join at runtime") {
    val prev = (
      spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5"),
      spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"),
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    try {
      // thresholds lowered so the synthetic skew is "big" to AQE
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 95% of left rows share key 0
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(10000).select(col("id").as("k"), lit("dim").as("v"))
      val joined = left.join(right, "k")
      // materialize THIS frame (count() would execute a different plan and
      // leave joined's own AQE un-finalized)
      // 190,000 hot-key rows + the 500 distinct-key rows whose id < 10000
      assert(joined.collect().length == 190500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew handling expected in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", prev._1)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prev._2)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev._3)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._4)
    }
  }

  test("saltedJoin is row-identical to the plain join on skewed data") {
    // 90% of fact rows share key 0; dim has every key once
    val fact = spark.range(5000)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 37).as("k"),
        col("id").as("payload"))
    val dim = spark.range(37).select(col("id").as("dk"), (col("id") * 100).as("v"))
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "payload", "v")
    val salted = graft.ops.SkewOps.saltedJoin(fact, col("k"), dim, col("dk"), salts = 8)
      .select("k", "payload", "v")
    // exceptAll both ways = multiset equality (duplicates matter)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    assert(salted.count() == plain.count())
  }
}
