package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.OrderedOps

/** The range-partitioned two-pass prefix sum must equal the window form
  * exactly while never coalescing to one task — the property that lets the
  * distinct-domain family (spearman/KS/winsorize/equi-depth) swap its
  * windows out at scale. */
class OrderedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cumSumsByKey equals the ordered window prefix sum; stays multi-partition") {
    val df = (1 to 5000).map(i => (i.toLong * 7 % 100003, (i % 13).toLong,
      (i % 5).toLong)).toDF("k", "a", "b").distinct()
    val two = OrderedOps.cumSumsByKey(df, "k", Seq("a", "b"), partitions = 8)
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("cum_a", sum("a").over(w))
      .withColumn("cum_b", sum("b").over(w))
    val got = two.orderBy("k").collect().map(_.toSeq)
    val exp = ref.orderBy("k").collect().map(_.toSeq)
    assert(got.toSeq == exp.toSeq, "two-pass prefix sums diverge from the window")
    assert(two.rdd.getNumPartitions > 1, "must not coalesce to a single task")
  }

  test("scaled spearman equals the window spearman on the same input") {
    val li = Tables.lineitem(spark, sfDir)
    val a = AuditQueries.corrSpearmanOf(li).collect().map(_.toSeq).toSeq
    val b = AuditQueries.corrSpearmanScaledOf(li).collect().map(_.toSeq).toSeq
    assert(a == b, "prefix-sum rewrite changed rho")
  }
}
