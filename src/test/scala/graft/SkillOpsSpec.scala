package graft

import org.apache.spark.sql.functions._

import graft.ops.SkillOps

/** FIXTURES.md §B3 taxonomy edge cases: first-match-wins over insertion
  * order, additive canonicalization, word boundaries, Other fallback. */
class SkillOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text")

  private def matchedTerms(text: String): Set[String] =
    SkillOps.matches(spark, docs(1L -> text))
      .collect().map(_.getString(1)).toSet

  test("ambiguous term resolves to its FIRST category (dict insertion order)") {
    val resolved = SkillOps.resolvedCategories(spark)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // 'join' is in Database (prio 1) and Operations (prio 2) -> Database
    assert(resolved("join") == "Database")
    // 'vector' is in Programming (prio 0) and Data (prio 3) -> Programming
    assert(resolved("vector") == "Programming")
  }

  test("word-boundary: term does not match inside a longer token") {
    // 'key' must not match inside 'monkey'; 'sort' not inside 'resort'
    assert(matchedTerms("monkey resort xs") == Set.empty)
    assert(matchedTerms("key sort xs") == Set("key", "sort"))
  }

  test("multi-word term matches only on adjacency") {
    assert(matchedTerms("a sort merge b").contains("sort merge"))
    assert(!matchedTerms("sort x merge").contains("sort merge"))
  }

  test("matches are set-semantic per document (repeats collapse)") {
    val m = SkillOps.matches(spark, docs(1L -> "spark spark spark"))
    assert(m.count() == 1)
  }

  test("case normalization: upper-case text still matches") {
    assert(matchedTerms("SPARK Query") == Set("spark", "query"))
  }

  test("additive canonicalization: variation emits raw AND canonical") {
    // mirror of the reference's "sql server" -> both "sql server" and "sql"
    // (pracuj_scraper.py:216-227): here "sort merge" -> itself + "sort"
    val m = SkillOps.matches(spark, docs(1L -> "x sort merge y"))
    val vdf = SkillOps.variationsDf(spark)
    val canon = m.join(vdf, col("term") === col("variation"))
      .select(col("doc_id"), col("canonical").as("skill"))
    val all = m.select(col("doc_id"), col("term").as("skill"))
      .unionByName(canon).distinct()
      .collect().map(_.getString(1)).toSet
    assert(all.contains("sort merge") && all.contains("sort"))
  }

  private def cascade(html: String): (Int, String) = {
    val (tier, skills) = SkillOps.cascadeSkills(col("html"))
    val r = Seq(html).toDF("html")
      .select(tier.as("t"), skills.as("s")).collect().head
    (r.getInt(0), r.getString(1))
  }

  test("cascade tier 1: >=2 dedicated skills short-circuit; bullet decoys never surface") {
    val html = "<html><ul data-test=\"aggregate-open-dictionary-model\">" +
      "<li class=\"x\">spark</li><li class=\"x\">table</li></ul>" +
      "<ul data-test=\"aggregate-bullet-model\"><li class=\"y\">merge filter decoys</li></ul></html>"
    assert(cascade(html) == (1, "spark,table"))
  }

  test("cascade tier 2: <2 dedicated skills falls back to bullet matching, ADDITIVELY") {
    val html = "<html><ul data-test=\"aggregate-open-dictionary-model\">" +
      "<li class=\"x\">query</li></ul>" +
      "<ul data-test=\"aggregate-bullet-model\"><li class=\"y\">needs spark here</li></ul></html>"
    // tier-1 'query' is KEPT and the bullet match is added (found_skills.update)
    assert(cascade(html) == (2, "query,spark"))
  }

  test("cascade tier 3: still <2 after bullets falls back to full page text") {
    val html = "<html><ul data-test=\"aggregate-open-dictionary-model\">" +
      "<li class=\"x\">query</li></ul>" +
      "<ul data-test=\"aggregate-bullet-model\"><li class=\"y\">nothing here</li></ul>" +
      "<p>body mentions vector and stream</p></html>"
    assert(cascade(html) == (3, "query,stream,vector"))
  }

  test("cascade maps variations additively at the end (sort merge -> + sort)") {
    val html = "<html><ul data-test=\"aggregate-open-dictionary-model\">" +
      "<li class=\"x\">spark</li><li class=\"x\">sort merge</li></ul></html>"
    assert(cascade(html) == (1, "sort,sort merge,spark"))
  }

  test("flagship categorizes unmatched tokens as Other and drops stopwords") {
    val out = Queries.byName("skill_category_counts").build(spark, sfDir)
    val byCat = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCat.contains("Other")) // 'customer', 'order', 'dup' etc.
    assert(byCat.keySet.intersect(
      Set("Programming", "Database", "Operations", "Data", "Scale")).nonEmpty)
  }
}
