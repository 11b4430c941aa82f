package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's skill-taxonomy semantics (SURVEY.md §2.6 J2/F6/F7/F8):
  *
  *  - first-match-wins category resolution over DICT INSERTION ORDER
  *    (scraper.py:20-24): encoded here as an explicit priority column +
  *    min_by, because Python dict order is implicit and Spark must make it
  *    explicit (SURVEY.md §7.4.2). `join` and `vector` are deliberately
  *    ambiguous (listed in two categories) to exercise the rule.
  *  - ADDITIVE variation canonicalization (pracuj_scraper.py:216-227): a term
  *    matching both a category list and a variations list yields BOTH the raw
  *    term and the canonical name (the reference's "sql server" → also "sql").
  *  - word-boundary matching against lowered text (pracuj_scraper.py:183-197).
  *
  * Scale design: single-word terms are matched by token-explode + broadcast
  * hash join (no per-term regex scans — the reference's O(terms×text) regex
  * loop is the #1 thing NOT to port, SURVEY.md §4.2). Multi-word terms are
  * matched in ONE pass per document by the character-level Aho-Corasick
  * automaton ([[graft.functions.AhoCorasick]], r07 — same `\b` semantics as
  * the regex bank it replaced, O(chars) instead of O(terms·chars)). At
  * 100 TB both sides stream: no shuffle until the final aggregation.
  */
object SkillOps {

  /** Category lists in priority (insertion) order — the testdata-token
    * analog of pracuj_scraper.py:25-42's 16-category dict. */
  val categories: Seq[(String, Seq[String])] = Seq(
    "Programming" -> Seq("spark", "query", "scan", "vector"),
    "Database" -> Seq("table", "row", "column", "key", "join"),
    "Operations" -> Seq("join", "merge", "sort", "filter", "agg", "group",
      "window", "hash", "sort merge", "hash join"),
    "Data" -> Seq("data", "batch", "stream", "value", "line", "part", "vector"),
    "Scale" -> Seq("big", "small", "fast", "slow"),
  )

  /** Variation → canonical-name map (pracuj_scraper.py:204-214 analog).
    * Additive: matching "sort merge" emits it AND "sort". */
  val variations: Seq[(String, String)] = Seq(
    "sort merge" -> "sort",
    "hash join" -> "hash",
  )

  /** Tokens that are never skills (the reference's untracked page chrome). */
  val stopwords: Seq[String] = Seq("the", "a")

  /** (term, category, priority) rows; priority = category insertion index,
    * so min_by(category, priority) reproduces first-match-wins. */
  def taxonomyRows: Seq[(String, String, Int)] =
    categories.zipWithIndex.flatMap { case ((cat, terms), i) =>
      terms.map(t => (t, cat, i))
    }

  def taxonomyDf(s: SparkSession): DataFrame =
    s.createDataFrame(taxonomyRows).toDF("term", "category", "priority")

  def variationsDf(s: SparkSession): DataFrame =
    s.createDataFrame(variations).toDF("variation", "canonical")

  /** Resolved term → category (first-match-wins). Tiny (≤ terms) — always
    * broadcast. */
  def resolvedCategories(s: SparkSession): DataFrame =
    resolvedWith(taxonomyDf(s))

  /** First-match-wins resolution over any (term, category, priority) frame. */
  def resolvedWith(tax: DataFrame): DataFrame =
    tax.groupBy("term")
      .agg(min_by(col("category"), col("priority")).as("category"))

  /** Distinct (doc_id, term) matches over a text table: token hash-join for
    * single-word terms + one broadcast regex theta-join for multi-word terms.
    * Set semantics per document (the reference's per-listing `set()`,
    * pracuj_scraper.py:155-178). */
  def matches(s: SparkSession, docs: DataFrame): DataFrame =
    matchesWith(s, docs, taxonomyRows.map(_._1).distinct)

  /** Dictionary matches of a free-text column as a PURE column expression
    * (single-word terms via token-set membership, multi-word terms via
    * word-boundary regex) — the per-row form of [[matchesWith]] for use
    * inside conditional cascades, where a join can't short-circuit per row
    * (pracuj_scraper.py:183-197). */
  def textMatchArray(text: Column): Column =
    textMatchArrayWith(text, taxonomyRows.map(_._1).distinct)

  /** textMatchArray over an arbitrary term list — the real reference
    * dictionary plugs in here (see ReferenceTaxonomySpec). One codegen'd
    * text pass per row ([[graft.functions.TermMatchArray]]: token-set for
    * single-word terms, Aho-Corasick with exact `\b` semantics for
    * multi-word — r07; replaced an `array_union(token filter, per-term
    * regex bank)` with identical output, order included). */
  def textMatchArrayWith(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.TermMatchArray(
        org.apache.spark.sql.GraftSqlShim.expression(text), terms.distinct))

  /** The reference's 3-tier skills-extraction cascade
    * (pracuj_scraper.py:153-181) as a when/coalesce short-circuit chain
    * (SURVEY.md §3.2): take the dedicated skills list; if it yields fewer
    * than 2 skills, ADD description-bullet dictionary matches; if still
    * fewer than 2, ADD full-page-text matches; finally map through the
    * additive variations (raw term kept, canonical appended). Returns
    * (tier, skills): the tier that satisfied the cascade and the sorted
    * comma-joined skill set. Scan-shaped — no joins, no shuffles. */
  def cascadeSkills(html: Column): (Column, Column) =
    cascadeSkillsWith(html, taxonomyRows.map(_._1).distinct, variations)

  /** cascadeSkills over an arbitrary dictionary + variations map — the
    * engine is dictionary-agnostic; the reference's real 348-term dict
    * drops in unchanged (ReferenceTaxonomySpec proves it). */
  def cascadeSkillsWith(html: Column, terms: Seq[String],
      vars: Seq[(String, String)]): (Column, Column) = {
    val f1 = array_distinct(transform(HtmlOps.skillItems(html), t => lower(t)))
    val f2 = when(size(f1) >= 2, f1)
      .otherwise(array_union(f1, textMatchArrayWith(HtmlOps.bulletText(html), terms)))
    val f3 = when(size(f2) >= 2, f2)
      .otherwise(array_union(f2, textMatchArrayWith(HtmlOps.pageText(html), terms)))
    val tier = when(size(f1) >= 2, lit(1))
      .when(size(f2) >= 2, lit(2)).otherwise(lit(3))
    val matched = filter(f3, t => t.isin(terms.distinct: _*))
    val canon = array_compact(array(vars.map { case (v, c) =>
      when(array_contains(f3, v), lit(c))
    }: _*))
    val skills = array_join(sort_array(array_distinct(concat(matched, canon))), ",")
    (tier, skills)
  }

  /** matches() over an arbitrary term list (same word-boundary semantics) —
    * lets callers swap in domain taxonomies like the reference's real
    * 16-category skill dictionary. */
  def matchesWith(s: SparkSession, docs: DataFrame, terms: Seq[String]): DataFrame = {
    val (multi, single) = terms.distinct.partition(_.contains(" "))
    val singleDf = s.createDataFrame(single.map(Tuple1(_))).toDF("term")
    // array_distinct BEFORE explode: per-doc set semantics for free, and the
    // exploded row count drops to the per-doc vocabulary size — no
    // post-explode distinct() shuffle needed (single/multi term sets are
    // disjoint, so the union introduces no duplicates either).
    val tokens = docs
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), "\\s+"))).as("tok"))
    val singleMatches = tokens
      .join(broadcast(singleDf), col("tok") === col("term"))
      .select("doc_id", "term")
    if (multi.isEmpty) singleMatches
    else {
      // multi-word terms in ONE text pass via the character-level
      // Aho-Corasick Generator (r07; replaced a bank of per-term
      // word-boundary regexes — O(terms) scans per document, the
      // reference's pracuj_scraper.py:183-197 shape, and the dominant CPU
      // cost of dictionary matching at corpus scale). Semantics are
      // unchanged: the automaton reproduces `\b<escaped term>\b` exactly.
      val multiMatches = docs.select(col("doc_id"),
        org.apache.spark.sql.GraftSqlShim.column(
          graft.functions.TermMatchGenerator(
            org.apache.spark.sql.GraftSqlShim.expression(col("text")),
            multi)).as("term"))
      singleMatches.unionByName(multiMatches)
    }
  }
}
