package graft

import org.apache.spark.sql.functions._

import graft.ops.{ReferenceTaxonomy, SkillOps}

/** FIXTURES.md §B3 with a reference-shaped taxonomy: the ambiguous terms the
  * real dictionary contains must resolve to their FIRST category (dict
  * insertion order, scraper.py:20-24), the additive "sql server" → "sql"
  * canonicalization must emit both, word boundaries and regex-special terms
  * must behave. A compact domain dictionary stands in for the full 348-term
  * one — same shape, same edge cases.
  */
class ReferenceTaxonomySpec extends SparkSpec {
  import spark.implicits._

  // insertion order mirrors the reference's category order: the ambiguous
  // terms below each appear in TWO categories; first wins.
  private val refCategories: Seq[(String, Seq[String])] = Seq(
    "Programming" -> Seq("python", "scala", "scikit-learn", "c++"),
    "Database" -> Seq("sql", "sql server", "oracle", "snowflake", "postgresql"),
    "Cloud" -> Seq("aws", "azure", "snowflake", "gcp"),
    "ERP" -> Seq("sap", "oracle", "dynamics"),
    "Visualization" -> Seq("tableau", "power bi", "reporting", "d3.js"),
    "Analysis" -> Seq("excel", "reporting", "statistics"),
  )

  private val refTaxonomy: Seq[(String, String, Int)] =
    refCategories.zipWithIndex.flatMap { case ((cat, ts), i) => ts.map((_, cat, i)) }

  private val refVariations = Seq("sql server" -> "sql", "power bi" -> "powerbi")

  private def tax = spark.createDataFrame(refTaxonomy).toDF("term", "category", "priority")

  test("ambiguous terms resolve to first category in insertion order") {
    val resolved = SkillOps.resolvedWith(tax)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(resolved("oracle") == "Database")     // not ERP
    assert(resolved("snowflake") == "Database")  // not Cloud
    assert(resolved("reporting") == "Visualization") // not Analysis
    assert(resolved("scikit-learn") == "Programming")
  }

  test("additive canonicalization: 'sql server' emits itself AND 'sql'") {
    val docs = Seq((1L, "we use sql server daily")).toDF("doc_id", "text")
    val m = SkillOps.matchesWith(spark, docs, refTaxonomy.map(_._1))
    val vars = refVariations.toDF("variation", "canonical")
    val skills = m.join(vars, col("term") === col("variation"), "left_outer")
      .select(explode(array_compact(array(col("term"), col("canonical")))).as("skill"))
      .collect().map(_.getString(0)).toSet
    // direct category match "sql server", word-boundary "sql" (prefix of
    // "sql server" text), and canonical "sql" from the variation
    assert(skills == Set("sql server", "sql"))
  }

  test("word boundary: 'sql' not matched inside 'nosqlite'; regex specials safe") {
    val docs = Seq(
      (1L, "nosqlite experience"),
      (2L, "c++ and d3.js mastery")).toDF("doc_id", "text")
    val m = SkillOps.matchesWith(spark, docs, refTaxonomy.map(_._1))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(!m.contains((1L, "sql")))
    assert(m.contains((2L, "c++")) && m.contains((2L, "d3.js")))
  }

  test("FULL reference dict: 348 terms / 16 categories; ambiguous terms resolve to first category") {
    assert(ReferenceTaxonomy.categories.size == 16)
    assert(ReferenceTaxonomy.taxonomyRows.size == 348)
    val fullTax = spark.createDataFrame(ReferenceTaxonomy.taxonomyRows)
      .toDF("term", "category", "priority")
    val resolved = SkillOps.resolvedWith(fullTax)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(resolved.size == ReferenceTaxonomy.allTerms.size)
    // the real dictionary's actual ambiguous terms (each listed in two
    // categories) must resolve by dict insertion order
    assert(resolved("oracle") == "Database")          // not ERP and CRM Systems
    assert(resolved("snowflake") == "Database")       // not Cloud
    assert(resolved("reporting") == "Visualization")  // not Business Intelligence
    assert(resolved("scikit-learn") == "Programming") // not Machine Learning and AI
  }

  test("FULL reference dict: additive variation 'sql server' emits itself AND 'sql'") {
    val docs = Seq((1L, "we use sql server daily")).toDF("doc_id", "text")
    val m = SkillOps.matchesWith(spark, docs, ReferenceTaxonomy.allTerms)
    val vars = ReferenceTaxonomy.variations.toDF("variation", "canonical")
    val skills = m.join(vars, col("term") === col("variation"), "left_outer")
      .select(explode(array_compact(array(col("term"), col("canonical")))).as("skill"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(skills == Set("sql server", "sql"), s"got $skills")
  }

  test("FULL reference dict: regex-special terms (c++, .net, d3.js, c#) match as tokens") {
    val docs = Seq((1L, "c++ and d3.js mastery"), (2L, ".net plus c# shop"))
      .toDF("doc_id", "text")
    val m = SkillOps.matchesWith(spark, docs, ReferenceTaxonomy.allTerms)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(m.contains((1L, "c++")) && m.contains((1L, "d3.js")))
    assert(m.contains((2L, ".net")) && m.contains((2L, "c#")))
  }

  test("FULL reference dict drives the 3-tier cascade: tier-1 raw skills map through variations") {
    // dedicated section lists 'power-bi' (a VARIATION, not a dict term) and
    // 'sql server' (dict term + variation): the cascade must keep the dict
    // term, map both through variations, and drop nothing silently
    val html = "<html><ul data-test=\"aggregate-open-dictionary-model\">" +
      "<li class=\"x\">sql server</li><li class=\"x\">power-bi</li></ul></html>"
    val (tier, skills) = SkillOps.cascadeSkillsWith(col("html"),
      ReferenceTaxonomy.allTerms, ReferenceTaxonomy.variations)
    val r = Seq(html).toDF("html").select(tier.as("t"), skills.as("s")).collect().head
    assert(r.getInt(0) == 1)
    // 'sql server' kept (dict) + canonical 'sql'; 'power-bi' maps to
    // canonical 'power bi' (itself a dict term) but the raw variation text
    // is not a dict term so only the canonical survives
    assert(r.getString(1) == "power bi,sql,sql server", s"got ${r.getString(1)}")
  }

  test("FULL reference dict cascade tier 2: description bullets matched against all 348 terms") {
    val html = "<html><ul data-test=\"aggregate-open-dictionary-model\">" +
      "<li class=\"x\">niche-skill</li></ul>" +
      "<ul data-test=\"aggregate-bullet-model\">" +
      "<li class=\"y\">experience with apache spark and python required</li></ul></html>"
    val (tier, skills) = SkillOps.cascadeSkillsWith(col("html"),
      ReferenceTaxonomy.allTerms, ReferenceTaxonomy.variations)
    val r = Seq(html).toDF("html").select(tier.as("t"), skills.as("s")).collect().head
    assert(r.getInt(0) == 2)
    val got = r.getString(1).split(",").toSet
    // single-word 'spark'/'python' via tokens, multi-word 'apache spark'
    // via the word-boundary regex; 'niche-skill' is not in the dict
    assert(Set("spark", "python", "apache spark").subsetOf(got), s"got $got")
    assert(!got.contains("niche-skill"))
  }

  test("unknown extracted skill categorizes as Other (scraper.py:20)") {
    val cand = Seq((1L, "kubernetes")).toDF("doc_id", "term")
    val got = cand.join(broadcast(SkillOps.resolvedWith(tax)), Seq("term"), "left_outer")
      .select(coalesce(col("category"), lit("Other")))
      .collect().head.getString(0)
    assert(got == "Other")
  }
}
