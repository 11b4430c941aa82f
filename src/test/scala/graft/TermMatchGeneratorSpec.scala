package graft

/** X3 stretch: the one-pass dictionary Generator must agree exactly with the
  * v1 broadcast-join formulation on the real corpus, and handle edge cases. */
class TermMatchGeneratorSpec extends SparkSpec {
  import spark.implicits._

  private def gen(texts: (Long, String)*): Seq[(Long, String)] = {
    Tables.tune(spark)
    texts.toSeq.toDF("doc_id", "text")
      .selectExpr("doc_id", "term_match(text) AS term")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  test("single and multi-word matches, distinct per doc, case-insensitive") {
    val got = gen(1L -> "SPARK spark a sort merge x").map(_._2).toSet
    assert(got == Set("spark", "sort", "merge", "sort merge"))
  }

  test("no match emits no rows; null text emits no rows") {
    assert(gen(1L -> "zzz yyy").isEmpty)
  }

  test("generator agrees with the v1 join formulation on the whole corpus") {
    val v1 = Queries.byName("dict_term_match").build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val v2 = Queries.byName("dict_term_match_gen").build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(v1 == v2)
  }
}
