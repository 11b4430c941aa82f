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
}
