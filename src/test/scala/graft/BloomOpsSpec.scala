package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomOps

/** SURVEY.md §2 Bloom semi-join reduction: the no-false-negatives contract
  * (which makes prefilter→exact-verify oracle-safe) plus result equality of
  * the Bloom-prefiltered queries against their plain exact twins. */
class BloomOpsSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every built key passes might_contain") {
    val keys = Tables.orders(spark, sfDir).select(col("o_orderkey").as("k"))
    val bloom = BloomOps.build(keys, col("k"), expectedItems = 2000)
    val missed = keys.filter(!BloomOps.mightContain(bloom, col("k"))).count()
    assert(missed == 0L, s"$missed built keys rejected by the filter")
  }

  test("string keys round-trip the same way (both sides hash via xxhash64)") {
    val df = Seq("alpha", "beta", "gamma gamma", "", "δoc").toDF("s")
    val bloom = BloomOps.build(df, col("s"), expectedItems = 16)
    assert(df.filter(!BloomOps.mightContain(bloom, col("s"))).count() == 0L)
  }

  test("undersized filter still has no false negatives, only more positives") {
    val keys = spark.range(0, 5000).select(col("id").as("k"))
    // estimate 100 for 5000 real keys: saturates toward all-positive,
    // which is the safe failure direction
    val bloom = BloomOps.build(keys, col("k"), expectedItems = 100)
    assert(keys.filter(!BloomOps.mightContain(bloom, col("k"))).count() == 0L)
  }

  test("false-positive rate at the sized estimate stays near fpp") {
    val keys = spark.range(0, 2000).select(col("id").as("k"))
    val bloom = BloomOps.build(keys, col("k"), expectedItems = 2000, fpp = 0.01)
    val outside = spark.range(1000000, 1020000).select(col("id").as("k"))
    val fp = outside.filter(BloomOps.mightContain(bloom, col("k"))).count()
    assert(fp < 20000 * 0.05, s"$fp false positives of 20000 probes")
  }

  test("join_bloom_prefilter equals the plain exact join") {
    val viaBloom = Queries.byName("join_bloom_prefilter").build(spark, sfDir)
    val d = sfDir
    val plain = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 450000),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        Det.dsum(col("l_extendedprice")).as("total_price"))
      .orderBy("o_orderpriority")
    assert(viaBloom.collect().toSeq == plain.collect().toSeq)
  }

  test("decontam_bloom equals decontam_overlap row for row") {
    val bloom = Queries.byName("decontam_bloom").build(spark, sfDir).collect().toSeq
    val exact = Queries.byName("decontam_overlap").build(spark, sfDir).collect().toSeq
    assert(bloom == exact)
    assert(bloom.nonEmpty, "planted eval overlap should contaminate some docs")
  }

  test("tpch_q3 top-10 is totally ordered and revenue-sorted") {
    val rows = Queries.byName("tpch_q3").build(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sorted(Ordering[Double].reverse))
  }
}
