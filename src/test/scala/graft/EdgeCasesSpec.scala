package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SkillOps, VectorOps}

/** Hardening: operators must degrade to empty results (never throw) on
  * empty or degenerate inputs — at 100 TB some partition/filter combination
  * WILL be empty. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("skill matching on an empty corpus is empty, not an error") {
    assert(SkillOps.matches(spark, noDocs).count() == 0)
  }

  test("dedup family on an empty corpus is empty") {
    assert(DedupOps.exactGroups(noDocs).count() == 0)
    assert(DedupOps.minhashPairs(noDocs, 16, 4).count() == 0)
  }

  test("dedup on single-token and empty-string docs") {
    val tiny = Seq((1L, "spark"), (2L, "")).toDF("doc_id", "text")
    // shingle size 3 over 1 token -> filtered out; no pairs, no crash
    assert(DedupOps.minhashPairs(tiny, 16, 4).count() == 0)
  }

  test("null text: dedup ops drop the row, never throw") {
    val docs = Seq((1L, Some("spark query scan")), (2L, None: Option[String]),
      (3L, Some("spark query scan"))).toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(docs, 16, 4).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 3L)))
    assert(DedupOps.jaccardPairs(docs, Long.MaxValue, 0.9).count() == 1)
  }

  test("null/garbage html: cascade yields empty skills at tier 3, never throws") {
    val docs = Seq((1L, Some("<html>no sections at all</html>")),
      (2L, None: Option[String])).toDF("doc_id", "html")
    val (tier, skills) = SkillOps.cascadeSkills(col("html"))
    val rows = docs.select(col("doc_id"), tier.as("t"), skills.as("s"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(rows(1L) == ((3, "")))     // no dictionary terms anywhere
    assert(rows(2L)._1 == 3)          // null html falls through all tiers
  }

  test("top-k aggregator on empty and single-row groups") {
    val df = Seq((1L, 5.0, 10L)).toDF("k", "v", "id")
    val got = df.groupBy("k")
      .agg(graft.ops.TopKOps.topK(3, col("v"), col("id")).as("top"))
      .select(col("k"), size(col("top")).as("n")).collect().head
    assert(got.getInt(1) == 1)
    val empty = Seq.empty[(Long, Double, Long)].toDF("k", "v", "id")
    assert(empty.groupBy("k")
      .agg(graft.ops.TopKOps.topK(3, col("v"), col("id"))).count() == 0)
  }

  test("bloom prefilter: no false negatives (result exact), real row reduction") {
    val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000.0)
      .select("o_orderkey")
    val bf = o.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContain(k))
    val li = Tables.lineitem(spark, sfDir)
    val total = li.count()
    val passed = li.filter(mightContain(col("l_orderkey"))).count()
    val trueMatches = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(passed < total, "prefilter must actually cut rows")
    assert(passed >= trueMatches, "no false negatives — every match survives")
  }

  test("knn with an empty query set is empty") {
    val e = Tables.embeddings(spark, sfDir)
    assert(VectorOps.knnCosine(e.filter(col("vec_id") < 0), e, 5).count() == 0)
  }

  test("salary parse on nulls yields nulls") {
    val (mn, mx) = graft.ops.ParseOps.salaryParse(col("t"))
    val r = Seq[Option[String]](None).toDF("t").select(mn, mx).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("term_match generator on empty string emits nothing") {
    Tables.tune(spark)
    val out = Seq((1L, "")).toDF("doc_id", "text")
      .selectExpr("doc_id", "term_match(text) AS term")
    assert(out.count() == 0)
  }

  test("HLL sketches merge losslessly and estimate within error") {
    val o = Tables.orders(spark, sfDir)
    // union of per-month sketches must equal the direct whole-column sketch
    // EXACTLY — HLL union is lossless at equal lgK, which is what makes
    // per-partition rollup tables re-aggregatable without rescanning
    val merged = o
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val direct = o
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .collect()(0).getLong(0)
    assert(merged == direct, s"sketch union must be lossless: $merged vs $direct")
    val exact = o.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL estimate $merged should be within 5% of exact $exact")
    // the registered query returns one summary row
    val row = Queries.byName("agg_hll_mergeable").build(spark, sfDir).collect()(0)
    assert(row.getLong(0) >= 1 && row.getLong(1) == merged)
  }

  test("sketch_percentiles: GK sketch lands within its rank-error bound of the exact percentiles") {
    val approx = Queries.byName("sketch_percentiles").build(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Queries.byName("agg_percentiles").build(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // accuracy 10000 => rank error <= 1e-4; on this value range a loose
    // VALUE tolerance of 2% of the exact percentile is far outside the
    // possible rank drift and still catches a broken sketch
    for ((k, (e50, e90, e99)) <- exact) {
      val (a50, a90, a99) = approx(k)
      for (((a, e), tag) <- Seq((a50, e50) -> "p50", (a90, e90) -> "p90", (a99, e99) -> "p99")) {
        assert(math.abs(a - e) <= 0.02 * e, s"$k $tag: approx $a vs exact $e")
      }
    }
  }

  test("sketch_count_min: CMS estimates obey the sketch guarantee (est >= exact, overshoot <= eps*N)") {
    val rows = Queries.byName("sketch_count_min").build(spark, sfDir).collect()
    assert(rows.length == 20)
    val n = Tables.lineitem(spark, sfDir).count()
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS can never undercount: key ${r.getLong(0)} est $est < exact $exact")
      assert(est - exact <= 0.001 * n,
        s"overshoot ${est - exact} beyond eps*N at key ${r.getLong(0)}")
    }
  }

  test("linkEntities: singleton names drop, exact-dup names cluster without any edge") {
    // 'alpha one' x2 records (no similar name), 'beta two' x1 (singleton),
    // 'beta twoX'/'beta twoXY' within lev 2 of each other
    val recs = Seq(
      (10L, "alpha one"), (11L, "alpha one"),
      (20L, "beta two"),
      (30L, "beta twoX"), (31L, "beta twoXY")
    ).toDF("rec_id", "name")
    val out = EntityQueries.linkEntities(recs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 'beta two' IS within lev 2 of 'beta twoX' (1 insert) and 'beta twoXY'
    // (2 inserts) -> all three beta names link; alpha pair self-clusters
    assert(out == Seq((10L, 2L, 10L), (20L, 3L, 20L)))
    // truly isolated singleton: unique name, no neighbors in its block
    val lone = Seq((1L, "zzzz unique")).toDF("rec_id", "name")
    assert(EntityQueries.linkEntities(lone).count() == 0)
  }

  test("linkEntities on empty input is empty, not an error") {
    assert(EntityQueries.linkEntities(
      Seq.empty[(Long, String)].toDF("rec_id", "name")).count() == 0)
  }

  test("TrendStore ranks deterministically under count ties (event_type breaks)") {
    val store = new graft.streaming.StreamOps.TrendStore
    store.upsertBatch(Seq((1L, "view", 5L), (1L, "click", 5L), (1L, "purchase", 3L)))
    assert(store.topK(2) == Seq((1L, "click", 5L, 1), (1L, "view", 5L, 2)))
  }

  test("sampleFrames with everyNth beyond the frame count keeps only frame 0") {
    import graft.ops.MultimodalOps
    val one = Seq((1L, Array.fill[Byte](300)(7), "video/fake"))
      .toDF("doc_id", "media", "mime").as[MultimodalOps.MediaRow]
    val frames = MultimodalOps.sampleFrames(one, 100).collect()
    assert(frames.map(f => (f.frame_idx, f.frame_len)).toSeq == Seq((0L, 256)))
  }

  test("recursive chain on an anchor-free subset returns no rows, not an error") {
    // no customers below key 10 -> empty anchor -> recursion yields nothing
    Tables.customer(spark, sfDir).filter(col("c_custkey") >= 10)
      .createOrReplaceTempView("v_edge_cust")
    val out = spark.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS k, 0 AS depth FROM v_edge_cust WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, ch.depth + 1 FROM v_edge_cust c
        |  JOIN chain ch ON CAST(FLOOR(c.c_custkey / 10) AS BIGINT) = ch.k
        |  WHERE c.c_custkey >= 10)
        |SELECT * FROM chain""".stripMargin)
    assert(out.count() == 0)
  }

  test("rows5FrameBucketedOf: exact frames across sparse and EMPTY buckets") {
    import java.sql.Timestamp
    // bucket width is 6 h. Rows are placed so the previous-4 of late rows
    // span several all-empty buckets (hour-200's frame reaches hours
    // 30/31/90/91, buckets 5 and 15 — bucket 32 is empty): the case a
    // single-previous-bucket carry silently gets wrong, and the reason the
    // carry is resolved on the tails frame instead.
    val hours = Seq(0L, 1L, 2L, 3L, 4L, 30L, 31L, 90L, 91L, 200L, 300L, 400L)
    val rows = hours.zipWithIndex.flatMap { case (h, i) =>
      Seq(("a", i.toLong, h), ("b", 1000L + i, h + 7L))
    }.map { case (t, id, h) =>
      (id, t, new Timestamp(h * 3600L * 1000L), (id % 17).toDouble)
    }
    val ev = rows.toDF("event_id", "event_type", "ts", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("ts", "event_id")
    val naive = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("frame", collect_list("value").over(w.rowsBetween(-4, 0)))
      .filter(col("rn") >= 5)
      .select(col("event_id"), col("value"), col("frame"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toList)
    val got = EventQueries.rows5FrameBucketedOf(ev).collect().map(key).sortBy(_._1).toSeq
    val want = naive.collect().map(key).sortBy(_._1).toSeq
    assert(want.nonEmpty && got == want)
  }
}
