package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AhoCorasick
import graft.ops.ReferenceTaxonomy

/** F6 v2: the character-level Aho-Corasick automaton must reproduce the
  * `\b<escaped term>\b` regex bank bit-for-bit — it replaced that bank in
  * SkillOps.matchesWith, whose DuckDB oracles still use the regexes. */
class AhoCorasickSpec extends AnyFunSuite {

  private def regexBank(terms: Seq[String]): Seq[(String, java.util.regex.Pattern)] =
    terms.map { t =>
      val esc = t.replaceAll("([.*+?^${}()|\\[\\]\\\\])", "\\\\$1")
      t -> java.util.regex.Pattern.compile("\\b" + esc + "\\b")
    }

  private def viaRegex(bank: Seq[(String, java.util.regex.Pattern)],
      text: String): Set[String] =
    bank.collect { case (t, p) if p.matcher(text).find() => t }.toSet

  private def viaAc(ac: AhoCorasick, text: String): Set[String] =
    ac.matchedPatterns(text).toSet

  test("equals the regex bank on the whole reference dictionary x corpus") {
    val terms = ReferenceTaxonomy.allTerms.filter(_.contains(" "))
    val ac = new AhoCorasick(terms.toArray)
    val bank = regexBank(terms)
    val texts = {
      val spark = SparkSpec.session
      Tables.documents(spark, "/root/testdata/sf0.001")
        .select("text").collect().map(_.getString(0))
    }
    assert(texts.nonEmpty)
    texts.foreach { raw =>
      val t = raw.toLowerCase(java.util.Locale.ROOT)
      assert(viaAc(ac, t) == viaRegex(bank, t), s"diverged on: $t")
    }
  }

  test("boundary quirks match Java-regex \\b exactly") {
    val terms = Array("c++ build", ".net core", "big (query)", "sql server")
    val ac = new AhoCorasick(terms)
    val bank = regexBank(terms.toSeq)
    val texts = Seq(
      "c++ build tools",        // pattern ends word char: boundary after 'd'
      "use c++ build",
      "the .net core stack",    // \b before '.' needs a word char BEFORE it
      "x.net core",             // word char before '.' → matches
      "big (query) time",       // \b after ')' needs a word char AFTER it
      "big (query)x",
      "big (query)",
      "sql server, yes",        // ',' after: boundary holds
      "sql serverless",         // no boundary mid-word
      "mssql server"            // no boundary before
    )
    texts.foreach { t =>
      assert(viaAc(ac, t) == viaRegex(bank, t), s"diverged on: $t")
    }
  }

  test("nested patterns all fire via the output-link chain") {
    val terms = Array("azure sql", "azure sql database", "sql database")
    val ac = new AhoCorasick(terms)
    assert(viaAc(ac, "on azure sql database now") == terms.toSet)
    assert(viaAc(ac, "plain azure sql here") == Set("azure sql"))
  }

  test("repeated occurrences: a later bounded occurrence counts even if the first is unbounded") {
    val ac = new AhoCorasick(Array("data lake"))
    // first occurrence embedded (no start boundary), second clean
    assert(viaAc(ac, "bigdata lake then a data lake") == Set("data lake"))
    assert(viaAc(ac, "bigdata lake only") == Set.empty[String])
  }

  test("empty pattern set matches nothing") {
    assert(new AhoCorasick(Array.empty[String]).matchedIds("anything").isEmpty)
  }

  test("TermMatchArray column equals the old array_union(token filter, regex bank) form, order included") {
    import org.apache.spark.sql.functions._
    val spark = SparkSpec.session
    val terms = ReferenceTaxonomy.allTerms
    // the pre-r07 formulation, inlined as the semantic reference
    def oldForm(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val (multi, single) = terms.distinct.partition(_.contains(" "))
      val toks = filter(array_distinct(split(lower(text), "\\s+")),
        t => t.isin(single: _*))
      val multiHits = array_compact(array(multi.map { mt =>
        val esc = mt.replaceAll("([.*+?^${}()|\\[\\]\\\\])", "\\\\$1")
        when(regexp_like(lower(text), lit("\\b" + esc + "\\b")), lit(mt))
      }: _*))
      array_union(toks, multiHits)
    }
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(
        graft.ops.SkillOps.textMatchArrayWith(col("text"), terms).as("ac"),
        oldForm(col("text")).as("old"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"ac=${r.getSeq[String](0)} old=${r.getSeq[String](1)}")
    }
  }
}
