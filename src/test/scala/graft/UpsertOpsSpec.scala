package graft

import org.apache.spark.sql.functions._

import graft.ops.UpsertOps

/** Incremental-maintenance contract: merging per-day deltas must equal the
  * full recomputation, and upserts prefer the newest version with incoming
  * winning ties. */
class UpsertOpsSpec extends SparkSpec {
  import spark.implicits._

  test("incremental count/sum merge equals full recomputation") {
    val o = Tables.orders(spark, sfDir)
    def aggOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))
    val cut = lit("1998-01-01").cast("timestamp")
    val full = aggOf(o).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val merged = UpsertOps.mergeCountSum(
        aggOf(o.filter(col("o_orderdate") < cut)),
        aggOf(o.filter(col("o_orderdate") >= cut)),
        Seq("o_orderstatus"), "cnt", "total")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(merged == full)
  }

  test("upsertLatest: newest version wins, incoming beats existing on ties") {
    val existing = Seq((1L, "old", 10L), (2L, "keep", 5L)).toDF("k", "v", "ver")
    val incoming = Seq((1L, "new", 11L), (3L, "add", 1L), (2L, "tie", 5L))
      .toDF("k", "v", "ver")
    val got = UpsertOps.upsertLatest(existing, incoming, Seq("k"), "ver")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "new", 2L -> "tie", 3L -> "add"))
  }
}
